"""Contract tests for the external-service adapter (the reference's W7
remote-anonymizer shape, server/src/utils/file.py:57-73): a map_batches
actor-pool stage POSTing batches to an HTTP endpoint with bounded
deterministic retry/backoff."""

import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _tag_batch(endpoint):
    from ocr_ray.ops.remote_service import RemoteEntityTagger

    tagger = RemoteEntityTagger(endpoint, backoff_s=0.01)
    batch = pa.table({
        "url": ["http://a.example/x", "http://a.example/x", "http://b.example/y"],
        "warc_ts": ["20240101000000", "20240101000000", "20240102000000"],
        "line": ["Contact Jane Doe at jane@example.com",
                 "call +351 21 123 4567 now",
                 "no entities here lowercase only"],
    })
    return tagger, tagger(batch)


def test_remote_tagger_matches_local_rules():
    """The transport must add/lose nothing: remote partials == the
    in-engine EntityTagWorker's on the same batch."""
    from ocr_ray.ops.ner import EntityTagWorker
    from ocr_ray.ops.remote_service import serve_fake_tagger

    server, endpoint = serve_fake_tagger()
    try:
        tagger, out = _tag_batch(endpoint)
        assert tagger.n_retries == 0
    finally:
        server.shutdown()
        server.server_close()

    batch = pa.table({
        "url": ["http://a.example/x", "http://a.example/x", "http://b.example/y"],
        "warc_ts": ["20240101000000", "20240101000000", "20240102000000"],
        "line": ["Contact Jane Doe at jane@example.com",
                 "call +351 21 123 4567 now",
                 "no entities here lowercase only"],
    })
    local = EntityTagWorker()(batch)
    key = ["url", "warc_ts", "entity_type"]
    a = out.to_pandas().sort_values(key).reset_index(drop=True)
    b = local.to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["entity_type"]) == {"email", "phone", "name"}


def test_remote_tagger_retries_transient_5xx():
    """First two responses are injected 503s; the client must back off,
    retry, and land the identical result — with the retry count visible."""
    from ocr_ray.ops.remote_service import serve_fake_tagger

    server, endpoint = serve_fake_tagger(fail_first=2)
    try:
        tagger, out = _tag_batch(endpoint)
        assert tagger.n_retries == 2
        assert out.num_rows > 0
        assert server.request_count() == 3
    finally:
        server.shutdown()
        server.server_close()


def test_remote_tagger_exhausts_retry_budget():
    """A persistently failing service must raise after the budget — rows
    are never silently dropped."""
    from ocr_ray.ops.remote_service import serve_fake_tagger

    server, endpoint = serve_fake_tagger(fail_first=100)
    try:
        with pytest.raises(RuntimeError, match="after 3 attempts"):
            from ocr_ray.ops.remote_service import RemoteEntityTagger

            tagger = RemoteEntityTagger(endpoint, max_retries=2, backoff_s=0.01)
            tagger(pa.table({"url": ["u"], "warc_ts": ["t"], "line": ["x"]}))
    finally:
        server.shutdown()
        server.server_close()


def test_remote_tagger_rejects_4xx_without_retry():
    """4xx is a caller bug, not a transient: fail fast, no retries."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ocr_ray.ops.remote_service import RemoteEntityTagger

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            self.send_response(400)
            self.end_headers()
            self.wfile.write(b"bad request")

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        tagger = RemoteEntityTagger(
            f"http://127.0.0.1:{server.server_address[1]}/tag", backoff_s=0.01)
        with pytest.raises(RuntimeError, match="rejected"):
            tagger(pa.table({"url": ["u"], "warc_ts": ["t"], "line": ["x"]}))
        assert tagger.n_retries == 0
    finally:
        server.shutdown()
        server.server_close()


def test_doc_entities_remote_equals_local(ray_session):
    """End-to-end through Ray: the remote path's final rollup must be
    byte-identical to the in-engine doc_entities (same oracle applies)."""
    from ocr_ray.ops.ner import doc_entities
    from ocr_ray.ops.remote_service import doc_entities_remote

    remote = doc_entities_remote(SF).to_pandas()
    local = pd.DataFrame(doc_entities(SF).take_all())
    key = ["url", "entity_type"]
    a = remote.sort_values(key).reset_index(drop=True)
    b = local.sort_values(key).reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_remote_tagger_retries_truncated_response():
    """A 200 whose body is cut short (IncompleteRead — an HTTPException,
    not an OSError) must consume retry budget and recover on a clean
    connection, not escape the retry loop or poison the persistent
    connection."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from ocr_ray.ops.remote_service import RemoteEntityTagger

    state = {"truncate_left": 1, "lock": threading.Lock()}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            self.rfile.read(int(self.headers["Content-Length"]))
            body = json.dumps({"rows": [["u", "t", "email", 1, "a@b.co"]]}).encode()
            with state["lock"]:
                trunc = state["truncate_left"] > 0
                if trunc:
                    state["truncate_left"] -= 1
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body) + 50 if trunc else len(body)))
            self.end_headers()
            self.wfile.write(body)
            if trunc:
                self.wfile.flush()
                self.connection.close()

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        tagger = RemoteEntityTagger(
            f"http://127.0.0.1:{server.server_address[1]}/tag", backoff_s=0.01)
        out = tagger(pa.table({"url": ["u"], "warc_ts": ["t"],
                               "line": ["mail a@b.co"]}))
        assert tagger.n_retries >= 1
        assert out.num_rows == 1
    finally:
        server.shutdown()
        server.server_close()


def test_remote_embedder_matches_local_kernel():
    """The embedding transport must return exactly the in-engine
    feature-hash vectors (shared kernel), including the retry path."""
    import numpy as np

    from ocr_ray.ops.documents import FEATHASH_DIM, feathash_vector
    from ocr_ray.ops.remote_service import RemoteEmbedder, serve_fake_embedder

    server, endpoint = serve_fake_embedder(fail_first=1)
    try:
        emb = RemoteEmbedder(endpoint, backoff_s=0.01)
        texts = ["alpha beta beta Gamma!", "", "alpha alpha"]
        out = emb(pa.table({"doc_id": [1, 2, 3], "text": texts}))
        assert emb.n_retries == 1
        m = out.column("vector").combine_chunks().flatten().to_numpy(
            zero_copy_only=False).reshape(3, FEATHASH_DIM)
        for i, t in enumerate(texts):
            assert (m[i] == feathash_vector(t)).all()
    finally:
        server.shutdown()
        server.server_close()


def test_hashed_bow_remote_equals_local(ray_session):
    """End-to-end through Ray: remote summary == in-engine summary."""
    from ocr_ray.ops.documents import hashed_bow_embeddings
    from ocr_ray.ops.remote_service import hashed_bow_remote

    remote = hashed_bow_remote(SF).to_pandas().sort_values("doc_id")
    local = pd.DataFrame(hashed_bow_embeddings(SF).take_all()).sort_values("doc_id")
    pd.testing.assert_frame_equal(
        remote.reset_index(drop=True), local.reset_index(drop=True))


def test_remote_embedder_empty_batch_needs_no_service():
    """An empty block must short-circuit with the typed empty table —
    no HTTP round trip, no reshape ambiguity."""
    from ocr_ray.ops.documents import FEATHASH_DIM
    from ocr_ray.ops.remote_service import RemoteEmbedder

    emb = RemoteEmbedder("http://127.0.0.1:9/none")  # unreachable on purpose
    out = emb(pa.table({"doc_id": pa.array([], pa.int64()),
                        "text": pa.array([], pa.string())}))
    assert out.num_rows == 0
    assert out.schema.field("vector").type == pa.list_(pa.int64(), FEATHASH_DIM)
