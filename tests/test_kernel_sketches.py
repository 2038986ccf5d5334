"""Dedup sketches + text stats determinism and basic properties."""

from ocr_ray.kernels import sketches, textstats

DOC_A = "the quick brown fox jumps over the lazy dog near the river bank today"
DOC_B = "the quick brown fox jumps over the lazy dog near the river bank tonight"
DOC_C = "completely different content about astronomy telescopes and planetary orbits"


def test_minhash_similarity_tracks_jaccard():
    sa = sketches.word_shingles(DOC_A)
    sb = sketches.word_shingles(DOC_B)
    sc = sketches.word_shingles(DOC_C)
    true_ab = sketches.jaccard(sa, sb)
    sig_a = sketches.minhash_signature(sa, 128)
    sig_b = sketches.minhash_signature(sb, 128)
    sig_c = sketches.minhash_signature(sc, 128)
    est_ab = sketches.minhash_similarity(sig_a, sig_b)
    assert abs(est_ab - true_ab) < 0.25
    assert sketches.minhash_similarity(sig_a, sig_c) < 0.2
    # determinism
    assert sig_a == sketches.minhash_signature(sketches.word_shingles(DOC_A), 128)


def test_minhash_bands_collide_for_near_dups():
    sig_a = sketches.minhash_signature(sketches.word_shingles(DOC_A), 64)
    sig_b = sketches.minhash_signature(sketches.word_shingles(DOC_B), 64)
    sig_c = sketches.minhash_signature(sketches.word_shingles(DOC_C), 64)
    bands_a = sketches.minhash_bands(sig_a, 16)
    bands_b = sketches.minhash_bands(sig_b, 16)
    bands_c = sketches.minhash_bands(sig_c, 16)
    assert set(bands_a) & set(bands_b)
    assert not set(bands_a) & set(bands_c)


def test_simhash_hamming():
    ha = sketches.simhash64(DOC_A)
    hb = sketches.simhash64(DOC_B)
    hc = sketches.simhash64(DOC_C)
    assert sketches.hamming64(ha, hb) < sketches.hamming64(ha, hc)
    assert sketches.hamming64(ha, ha) == 0


def test_char_ngram_jaccard():
    assert sketches.jaccard(sketches.char_ngrams(DOC_A), sketches.char_ngrams(DOC_A)) == 1.0
    assert sketches.jaccard(set(), set()) == 1.0
    assert sketches.jaccard(sketches.char_ngrams(DOC_A), set()) == 0.0


def test_langid():
    lang, conf = textstats.detect_language(
        "o que é que se passa com a casa do senhor quando não há mais nada"
    )
    assert lang == "por" and conf > 0.3
    lang, _ = textstats.detect_language("the quick brown fox is one of the many animals that we see")
    assert lang == "eng"
    assert textstats.detect_language("xy")[0] == "und"


def test_quality_and_tokens():
    q = textstats.quality_features(DOC_A)
    assert q["n_words"] == 14
    assert 0 <= q["quality_score"] <= 1
    assert textstats.token_count_ws("a b  c") == 3
    # can ' t stop , won ' t stop .
    assert textstats.token_count_bpe("can't stop, won't stop.") == 10


def test_winnow_fingerprint_deterministic_and_robust():
    fp1 = textstats.winnow_fingerprint(DOC_A)
    fp2 = textstats.winnow_fingerprint(DOC_A)
    assert fp1 == fp2 and fp1
    # shared windows between near-identical docs
    fa = set(textstats.winnow_fingerprint(DOC_A))
    fb = set(textstats.winnow_fingerprint(DOC_B))
    assert len(fa & fb) / len(fa | fb) > 0.5


def test_minhash_vectorized_matches_bigint_reference():
    """The uint64-folded numpy inner product must equal the plain Python
    big-int formula bit for bit (the SQL oracle replays the same params in
    HUGEINT, so any divergence here fails the correctness gate too)."""
    import random

    M = (1 << 61) - 1
    MAXH = (1 << 32) - 1

    def ref_sig(shingles, num_perm=64, seed=1):
        params = sketches._minhash_params(num_perm, seed)
        if not shingles:
            return [MAXH] * num_perm
        hashes = [sketches._stable_hash64(s) % M for s in shingles]
        return [min(((a * h + b) % M) & MAXH for h in hashes)
                for a, b in params]

    rng = random.Random(7)
    for _ in range(25):
        sh = {bytes(rng.randrange(256) for _ in range(rng.randrange(1, 24)))
              for _ in range(rng.randrange(1, 400))}
        assert sketches.minhash_signature(sh) == ref_sig(sh)
    assert sketches.minhash_signature(set()) == [MAXH] * 64
    assert sketches.minhash_signature({b"x"}) == ref_sig({b"x"})


def test_simhash_vectorized_matches_per_bit_reference():
    """The unpackbits accumulation must equal the per-bit ±1 loop exactly
    (weights[b] > 0 ⟺ 2·ones[b] > n)."""
    def ref(text):
        weights = [0] * 64
        for token in text.lower().split():
            h = sketches._stable_hash64(token.encode())
            for bit in range(64):
                weights[bit] += 1 if (h >> bit) & 1 else -1
        out = 0
        for bit in range(64):
            if weights[bit] > 0:
                out |= 1 << bit
        return out

    cases = ["", "one", "a b a", "The quick brown fox", "x " * 100,
             "mixed CASE Tokens repeat repeat repeat"]
    for t in cases:
        assert sketches.simhash64(t) == ref(t)
