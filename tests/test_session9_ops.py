"""Structural unit tests for the session-9 operator wave (no Ray):
edit-distance verifier, winnowing selection, CUSUM closed form, quantized
Zipf OLS, Adamic-Adar hand-check, and the Q2 argmin packing order."""

from __future__ import annotations

import math
import random

from ocr_ray.ops.documents import (
    ENTROPY_QLOG_SCALE,
    _is_edit1,
    winnow_select,
)
from ocr_ray.ops.graph import AA_QSCALE
from ocr_ray.ops.relational import SUPPKEY_BITS


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_is_edit1_matches_dp_levenshtein():
    rng = random.Random(7)
    alphabet = "abcd"
    words = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
             for _ in range(120)]
    for a in words:
        for b in words:
            assert _is_edit1(a, b) == (_levenshtein(a, b) == 1), (a, b)


def test_winnow_select_rightmost_tie_and_dedup():
    # windows of 4 over [5,3,3,7,1,1,2]: min ties pick the RIGHTMOST pos,
    # adjacent windows picking the same gram collapse to one fingerprint
    assert winnow_select([5, 3, 3, 7, 1, 1, 2], 4) == [(3, 3), (5, 1), (6, 1)]
    # fewer grams than the window -> no fingerprints
    assert winnow_select([1, 2, 3], 4) == []


def test_winnow_select_matches_naive_reference():
    rng = random.Random(11)
    for _ in range(50):
        hs = [rng.randint(-5, 5) for _ in range(rng.randint(4, 40))]
        w = rng.randint(2, 6)
        naive = set()
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            pos = j + max(i for i, v in enumerate(win) if v == m)
            naive.add((pos + 1, m))
        assert winnow_select(hs, w) == sorted(naive)


def test_winnow_shared_run_guarantee():
    # any K+W-1-gram shared run between two docs shares >= 1 fingerprint
    rng = random.Random(3)
    w = 4
    shared = [rng.randint(-10**6, 10**6) for _ in range(12)]
    a = [rng.randint(-10**6, 10**6) for _ in range(9)] + shared
    b = shared + [rng.randint(-10**6, 10**6) for _ in range(7)]
    fa = {h for _, h in winnow_select(a, w)}
    fb = {h for _, h in winnow_select(b, w)}
    assert fa & fb & set(shared)


def test_cusum_closed_form_equals_recursion():
    rng = random.Random(5)
    for _ in range(30):
        xs = [rng.randint(0, 500) for _ in range(rng.randint(1, 40))]
        n, total = len(xs), sum(xs)
        # engine closed form: P - min(0, running min P)
        run, lo, closed = 0, 0, []
        for x in xs:
            run += n * x - total
            lo = min(lo, run)
            closed.append(run - lo)
        # textbook recursion S_i = max(0, S_{i-1} + n·x_i − total)
        s, rec = 0, []
        for x in xs:
            s = max(0, s + n * x - total)
            rec.append(s)
        assert closed == rec


def test_zipf_quantized_ols_recovers_exact_line():
    # counts following count = 2^16 / rank exactly give slope −1 after the
    # log2 quantization (every point lands on the lattice exactly)
    n = 64
    xs = [round(math.log2(r) * ENTROPY_QLOG_SCALE) for r in range(1, n + 1)]
    ys = [round(math.log2((1 << 16) / r) * ENTROPY_QLOG_SCALE)
          for r in range(1, n + 1)]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert abs(slope + 1.0) < 1e-9
    intercept = (float(sy) - slope * float(sx)) / float(n)
    assert abs(intercept - 16.0 * ENTROPY_QLOG_SCALE) < 2.0


def test_adamic_adar_weight_has_no_round_half_boundary():
    # power-of-two degrees give exact integer quotients; a .5 boundary
    # would need 2^21/k odd, impossible for k <= 2^20 (see ops.graph)
    for d in range(2, 4096):
        q = AA_QSCALE / math.log2(d)
        assert abs(q - math.floor(q) - 0.5) > 1e-9


def test_cheapest_supplier_packing_is_lexicographic():
    rng = random.Random(9)
    pairs = [(rng.randint(0, 10**8), rng.randint(1, (1 << SUPPKEY_BITS) - 1))
             for _ in range(500)]
    packed = [(um << SUPPKEY_BITS) | sk for um, sk in pairs]
    best = min(packed)
    um, sk = best >> SUPPKEY_BITS, best & ((1 << SUPPKEY_BITS) - 1)
    assert (um, sk) == min(pairs)


def test_value_moments_algebra_matches_float_reference():
    rng = random.Random(13)
    xs = [rng.randint(0, 900) for _ in range(500)]
    n, s1 = len(xs), sum(xs)
    s2 = sum(x * x for x in xs)
    s3 = sum(x ** 3 for x in xs)
    s4 = sum(x ** 4 for x in xs)
    num2 = n * s2 - s1 * s1
    num3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
    num4 = n ** 3 * s4 - 4 * n * n * s1 * s3 + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4
    m2 = float(num2) / float(n * n)
    skew = (float(num3) / float(n ** 3)) / m2 ** 1.5
    kurt = (float(num4) / float(n ** 4)) / (m2 * m2) - 3.0
    mu = s1 / n
    m2f = sum((x - mu) ** 2 for x in xs) / n
    m3f = sum((x - mu) ** 3 for x in xs) / n
    m4f = sum((x - mu) ** 4 for x in xs) / n
    assert abs(skew - m3f / m2f ** 1.5) < 1e-9
    assert abs(kurt - (m4f / m2f ** 2 - 3.0)) < 1e-9


def test_mad_nearest_rank_matches_direct():
    rng = random.Random(17)
    for _ in range(40):
        xs = [rng.randint(-50, 50) for _ in range(rng.randint(1, 99))]
        n = len(xs)
        rank = (n + 1) // 2
        med = sorted(xs)[rank - 1]  # lower-nearest-rank median
        mad = sorted(abs(x - med) for x in xs)[rank - 1]
        # histogram route (the engine's): cumulative counts over values
        import collections
        h = collections.Counter(xs)
        cum = 0
        for v in sorted(h):
            cum += h[v]
            if cum >= rank:
                med_h = v
                break
        d = collections.Counter(abs(x - med_h) for x in xs)
        cum = 0
        for v in sorted(d):
            cum += d[v]
            if cum >= rank:
                mad_h = v
                break
        assert (med_h, mad_h) == (med, mad)


def test_label_runs_matches_flood_fill():
    import numpy as np

    from ocr_ray.ops.multimodal import label_runs

    def brute(ink):
        h, w = ink.shape
        seen = np.zeros_like(ink, dtype=bool)
        sizes = []
        for y in range(h):
            for x in range(w):
                if ink[y, x] and not seen[y, x]:
                    stack = [(y, x)]
                    seen[y, x] = True
                    s = 0
                    while stack:
                        cy, cx = stack.pop()
                        s += 1
                        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                            ny, nx = cy + dy, cx + dx
                            if (0 <= ny < h and 0 <= nx < w
                                    and ink[ny, nx] and not seen[ny, nx]):
                                seen[ny, nx] = True
                                stack.append((ny, nx))
                    sizes.append(s)
        return len(sizes), max(sizes, default=0)

    rng = random.Random(21)
    for _ in range(150):
        h, w = rng.randint(1, 12), rng.randint(1, 12)
        ink = np.array([[rng.random() < 0.45 for _ in range(w)]
                        for _ in range(h)])
        runs = []
        rid = 0
        for y in range(h):
            d = np.flatnonzero(np.diff(np.concatenate(
                ([0], ink[y].view(np.int8), [0]))))
            for x0, x1 in zip(d[::2], d[1::2]):
                runs.append((y, int(x0), int(x1) - 1, rid))
                rid += 1
        labels = label_runs(runs)
        import collections
        size = collections.defaultdict(int)
        for (y, x0, x1, _), lab in zip(runs, labels):
            size[lab] += x1 - x0 + 1
        assert (len(size), max(size.values(), default=0)) == brute(ink)


def test_markov_power_iterate_conserves_and_converges():
    from ocr_ray.ops.relational import MARKOV_SCALE, markov_power_iterate

    # two-state chain with known stationary (2/3, 1/3): P = [[.5,.5],[1,0]]
    counts = {("a", "a"): 1, ("a", "b"): 1, ("b", "a"): 2}
    v = markov_power_iterate(["a", "b"], counts, rounds=40)
    total = sum(v.values())
    # floor divisions only ever LOSE mass, and only a few units per round
    assert MARKOV_SCALE - total < 40 * 4
    assert abs(v["a"] / MARKOV_SCALE - 2 / 3) < 1e-3
    assert abs(v["b"] / MARKOV_SCALE - 1 / 3) < 1e-3
    # dangling type keeps its mass via the self-loop rule
    v2 = markov_power_iterate(["a", "b", "z"], counts, rounds=5)
    assert v2["z"] == MARKOV_SCALE // 3


def test_compaction_greedy_groups_are_contiguous_and_capped():
    from ocr_ray.ops.relational import COMPACT_TARGET_CHARS

    rng = random.Random(23)
    sizes = [rng.randint(1000, 30000) for _ in range(60)]
    gid, cum, gids = 0, 0, []
    for b in sizes:
        gids.append(gid)
        cum += b
        if cum >= COMPACT_TARGET_CHARS:
            gid, cum = gid + 1, 0
    # groups are contiguous ascending
    assert gids == sorted(gids)
    # every CLOSED group reached the target; all groups below target
    # before their closing file
    import collections
    per = collections.defaultdict(list)
    for g, b in zip(gids, sizes):
        per[g].append(b)
    for g in range(gid):  # all but the (possibly open) last group
        assert sum(per[g]) >= COMPACT_TARGET_CHARS
        assert sum(per[g][:-1]) < COMPACT_TARGET_CHARS


def test_trustrank_concentrates_on_seed_neighborhood():
    from ocr_ray.ops.graph import (
        TRUST_SCALE, TRUST_SEEDS, trustrank_power_iterate,
    )

    # star A: seeds a0..a3 link hub h; isolated far pair x->y gets no
    # teleport and only decaying pass-through mass
    hosts = ["a0", "a1", "a2", "a3", "h", "x", "y"]
    edges = [("a0", "h", 1), ("a1", "h", 1), ("a2", "h", 1),
             ("a3", "h", 1), ("x", "y", 1)]
    v = trustrank_power_iterate(edges, hosts)
    assert sorted(hosts)[:TRUST_SEEDS] == ["a0", "a1", "a2", "a3"]
    # hub receives damped seed mass; the disconnected pair decays to ~0
    assert v["h"] > TRUST_SCALE // 10
    assert v["y"] == 0 and v["x"] == 0
    # seeds keep their teleport floor
    tele = ((100 - 85) * (TRUST_SCALE // 4)) // 100
    for s in ("a0", "a1", "a2", "a3"):
        assert v[s] >= tele
    # deterministic
    assert v == trustrank_power_iterate(edges, hosts)


def test_lower_ordinal_median_rule():
    # the video_keyframes pick: element at position (n+1)//2 (1-based) ==
    # index (n+1)//2 - 1; verify parity with SQL's rn = (cnt+1)//2
    for n in range(1, 12):
        sel = list(range(100, 100 + n))
        k = sel[(n + 1) // 2 - 1]
        rn_pick = [v for i, v in enumerate(sel, 1) if i == (n + 1) // 2]
        assert [k] == rn_pick


def test_empty_result_keeps_schema(ray_session):
    # the driver's correctness gate never consults Dataset.schema() on an
    # empty result (the round-4 schema fails), so can-be-empty queries now
    # return a MATERIALIZED typed pa.Table — schema survives any
    # conversion (sf0.001 ships every part, so this result is genuinely
    # empty)
    import pyarrow as pa

    from ocr_ray.ops.relational import parts_never_shipped

    tbl = parts_never_shipped("/root/testdata/sf0.001")
    assert isinstance(tbl, pa.Table)
    assert tbl.schema.names == [
        "p_partkey", "p_brand", "p_type", "p_retailprice"]
    assert tbl.schema.field("p_partkey").type == pa.int64()
    assert tbl.schema.field("p_retailprice").type == pa.float64()
    assert tbl.num_rows == 0


def test_dup_span_scrub_removes_exact_shared_run(ray_session, tmp_path):
    """ExactSubstr semantics: a 20-token run shared verbatim by two docs
    is scrubbed from BOTH (cover = union of dup K-windows), while unique
    text and sub-K overlaps survive."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ocr_ray.ops.documents import DSS_DOC_MOD, DSS_K, dup_span_scrub

    shared = [f"s{i}" for i in range(20)]            # 20 > K=16: dup run
    a_uniq = [f"a{i}" for i in range(10)]
    b_uniq = [f"b{i}" for i in range(12)]
    c_uniq = [f"c{i}" for i in range(30)]            # fully unique doc
    docs = pa.table({
        "doc_id": pa.array([0, DSS_DOC_MOD, 2 * DSS_DOC_MOD], pa.int64()),
        "text": pa.array([
            " ".join(a_uniq + shared),
            " ".join(shared + b_uniq),
            " ".join(c_uniq),
        ]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    out = dup_span_scrub(str(tmp_path)).to_pandas().set_index("doc_id")
    # the shared 20 tokens are covered in both docs, nothing else
    assert out.loc[0, "n_tokens"] == 30 and out.loc[0, "n_removed"] == 20
    assert out.loc[DSS_DOC_MOD, "n_tokens"] == 32
    assert out.loc[DSS_DOC_MOD, "n_removed"] == 20
    assert out.loc[2 * DSS_DOC_MOD, "n_removed"] == 0
    assert out.loc[0, "clean_md5"] == hashlib.md5(
        " ".join(a_uniq).encode()).hexdigest()
    assert out.loc[DSS_DOC_MOD, "clean_md5"] == hashlib.md5(
        " ".join(b_uniq).encode()).hexdigest()
    assert out.loc[2 * DSS_DOC_MOD, "clean_md5"] == hashlib.md5(
        " ".join(c_uniq).encode()).hexdigest()
