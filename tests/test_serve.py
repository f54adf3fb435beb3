"""Serving stack: engine bucketing/padding invariance, micro-batcher,
HTTP endpoints."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax

from m3p_tpu.config import ModelConfig
from m3p_tpu.data.features import write_feature_shard
from m3p_tpu.model import build_model
from m3p_tpu.serve.batcher import MicroBatcher
from m3p_tpu.serve.engine import InferenceEngine, _bucket
from m3p_tpu.serve.server import make_server
from m3p_tpu.tokenization.tokenizer import XLMRTokenizer
from m3p_tpu.tokenization.unigram import train_unigram

CORPUS = [
    "a dog runs on the beach",
    "two cats sleep on the sofa",
    "a man rides a bicycle",
    "the quick brown fox jumps",
    "a red car on the street",
] * 5

R = 4       # regions
D = 2048    # feature dim (model default)


def _image(rng):
    return {"feats": rng.randn(R, D).astype(np.float32),
            "locs": rng.rand(R, 5).astype(np.float32)}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("serve_tok") / "unigram.tsv")
    train_unigram(CORPUS, vocab_size=150).save(path)
    tok = XLMRTokenizer(path)
    cfg = ModelConfig(
        n_words=tok.vocab_size, mask_index=tok.mask_token_id, n_langs=3,
        emb_dim=32, n_layers=2, n_dec_layers=2, n_heads=2, dropout=0.0,
        attention_dropout=0.0, max_region_num=R, refine_layers=1,
        dtype="float32", use_pallas_attention=False)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    return InferenceEngine(
        model, params, tokenizer=tok, max_regions=R,
        text_buckets=(8, 16), batch_buckets=(1, 2, 4),
        beam_size=2, max_gen_len=6, lang2id={"en": 0, "de": 1})


def test_bucket_helper():
    assert _bucket(1, (1, 2, 4)) == 1
    assert _bucket(3, (1, 2, 4)) == 4
    assert _bucket(9, (1, 2, 4)) == 4  # capped at the largest


def test_score_padding_invariance(engine):
    """A pair's score must not depend on which bucket/batch it rides in."""
    rng = np.random.RandomState(0)
    img = _image(rng)
    text = "a dog runs on the beach"
    solo = engine.score([text], [img])[0]
    others = [_image(rng) for _ in range(2)]
    batched = engine.score(
        [text, "two cats sleep", "a man rides"], [img] + others)[0]
    assert abs(solo - batched) < 1e-4
    # long text lands in a different bucket but is deterministic
    long_text = " ".join(["very"] * 40)
    s1 = engine.score([long_text], [img])[0]
    s2 = engine.score([long_text], [img])[0]
    assert s1 == s2


def test_jit_cache_bounded(engine):
    """Steady-state traffic must reuse compiled entry points."""
    rng = np.random.RandomState(1)
    before = len(engine._jit_cache)
    for _ in range(5):
        engine.score(["a dog"], [_image(rng)])
    after = len(engine._jit_cache)
    assert after <= before + 1


def test_retrieve_matches_pairwise_score(engine):
    rng = np.random.RandomState(2)
    gallery = [_image(rng) for _ in range(5)]
    ids = [f"img{i}" for i in range(5)]
    assert engine.load_gallery(gallery, ids) == 5
    text = "the quick brown fox jumps"
    results = engine.retrieve(text, top_k=5)
    assert [r["id"] for r in results[:1]]  # non-empty, best first
    scores = {r["id"]: r["score"] for r in results}
    # pairwise scores through the score() path must agree
    direct = engine.score([text] * 5, gallery)
    for i, s in enumerate(direct):
        assert abs(scores[f"img{i}"] - s) < 1e-4
    # ordering is by score descending
    vals = [r["score"] for r in results]
    assert vals == sorted(vals, reverse=True)


def test_caption_and_translate(engine):
    rng = np.random.RandomState(3)
    caps = engine.caption([_image(rng), _image(rng)], lang="en")
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    greedy = engine.caption([_image(rng)], beam_size=1)
    assert len(greedy) == 1
    out = engine.translate(["a dog runs"], tgt_lang="de", src_lang="en")
    assert len(out) == 1 and isinstance(out[0], str)
    with pytest.raises(ValueError):
        engine.translate(["x"], tgt_lang="xx")


def test_image_payload_boxes_wh(engine):
    rng = np.random.RandomState(4)
    boxes = np.array([[0, 0, 50, 50], [10, 10, 90, 80]], np.float32)
    payload = {"features": rng.randn(2, D).astype(np.float32),
               "boxes": boxes, "wh": [100.0, 100.0]}
    feats, locs, n = engine.resolve_image(payload)
    assert feats.shape == (R, D) and locs.shape == (R, 5) and n == 2
    # features L2-normalized, padding rows zero
    assert np.allclose(np.linalg.norm(feats[:2], axis=-1), 1.0, atol=1e-5)
    assert np.all(feats[2:] == 0)


def test_store_image_id(engine, tmp_path):
    rng = np.random.RandomState(5)
    n = 3
    path = str(tmp_path / "feats.h5")
    write_feature_shard(
        path, features=rng.randn(n, R, D).astype(np.float32),
        boxes=np.tile(np.array([[0, 0, 10, 10]], np.float32), (n, R, 1)),
        num_boxes=np.full((n,), R, np.int64),
        wh=np.tile(np.array([[20, 20]], np.float32), (n, 1)),
        image_ids=[f"im{i}" for i in range(n)])
    engine.attach_store(path)
    s = engine.score(["a dog"], [{"image_id": "im1"}])
    assert len(s) == 1 and np.isfinite(s[0])
    assert engine.load_gallery_from_store(limit=2) == 2
    engine._gallery = None  # don't leak into other tests


# ---------------------------------------------------------------------------
# micro-batcher
# ---------------------------------------------------------------------------


def test_microbatcher_coalesces_and_orders():
    calls = []

    def handler(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    mb = MicroBatcher(handler, max_batch=8, max_wait_s=0.05)
    futs = [mb.submit(i) for i in range(10)]
    results = [f.result(timeout=5) for f in futs]
    assert results == [i * 2 for i in range(10)]
    assert max(calls) > 1  # at least one call actually batched
    mb.stop()


def test_microbatcher_error_propagates():
    def handler(items):
        raise RuntimeError("boom")

    mb = MicroBatcher(handler, max_batch=4, max_wait_s=0.01)
    fut = mb.submit(1)
    with pytest.raises(RuntimeError, match="boom"):
        fut.result(timeout=5)
    # the worker survives a failed batch
    mb._handler = lambda items: items
    assert mb.submit(7).result(timeout=5) == 7
    mb.stop()


# ---------------------------------------------------------------------------
# HTTP server
# ---------------------------------------------------------------------------


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_endpoints(engine):
    rng = np.random.RandomState(6)
    server, app = make_server(engine, host="127.0.0.1", port=0,
                              max_batch=4, max_wait_s=0.01)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        img = _image(rng)
        pair = {"text": "a dog runs",
                "feats": img["feats"].tolist(),
                "locs": img["locs"].tolist()}
        status, out = _post(port, "/v1/score", {"pairs": [pair]})
        assert status == 200 and len(out["scores"]) == 1

        # concurrent single-pair requests ride the micro-batcher
        results = {}

        def hit(i):
            results[i] = _post(port, "/v1/score", {"pairs": [pair]})

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        vals = [results[i][1]["scores"][0] for i in range(4)]
        assert all(abs(v - vals[0]) < 1e-4 for v in vals)

        engine.load_gallery([_image(rng) for _ in range(3)],
                            ["a", "b", "c"])
        status, out = _post(port, "/v1/retrieve",
                            {"text": "two cats", "top_k": 2})
        assert status == 200 and len(out["results"]) == 2

        status, out = _post(port, "/v1/caption",
                            {"images": [{"feats": img["feats"].tolist(),
                                         "locs": img["locs"].tolist()}],
                             "beam_size": 1, "max_len": 5})
        assert status == 200 and len(out["captions"]) == 1

        status, out = _post(port, "/v1/translate",
                            {"texts": ["a dog"], "tgt_lang": "de",
                             "src_lang": "en", "beam_size": 1, "max_len": 5})
        assert status == 200 and len(out["translations"]) == 1

        status, out = _post(port, "/v1/nope", {})
        assert status == 404
        status, out = _post(port, "/v1/score", {"wrong": []})
        assert status == 400 and "error" in out
    finally:
        server.shutdown()
        server.server_close()
        app.close()
        engine._gallery = None


# ---------------------------------------------------------------------------
# Robustness (VERDICT r3 item 8): malformed/oversized payloads, backpressure,
# timeouts, fuzz survival, int8-vs-fp ranking invariance
# ---------------------------------------------------------------------------


def _post_raw(port, path, data: bytes, headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data,
        headers={"Content-Type": "application/json", **(headers or {})})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.fixture()
def server_fixture(engine):
    server, app = make_server(engine, host="127.0.0.1", port=0,
                              max_batch=4, max_wait_s=0.01)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server, app, port
    server.shutdown()
    server.server_close()
    app.close()


class TestServeRobustness:
    def test_malformed_json_400(self, server_fixture):
        _, _, port = server_fixture
        status, body = _post_raw(port, "/v1/score", b"{not json!!")
        assert status == 400 and b"bad JSON" in body
        # valid JSON but not an object
        status, body = _post_raw(port, "/v1/score", b"[1, 2, 3]")
        assert status == 400
        # empty body -> 400 missing key, not a crash
        status, body = _post_raw(port, "/v1/score", b"")
        assert status == 400

    def test_oversized_payload_413(self, engine):
        server, app = make_server(engine, host="127.0.0.1", port=0,
                                  max_body_bytes=1024)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            big = b'{"pairs": [' + b"0," * 10000 + b"0]}"
            status, body = _post_raw(port, "/v1/score", big)
            assert status == 413 and b"exceeds" in body
            # server still alive afterwards
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=10) as r:
                assert r.status == 200
        finally:
            server.shutdown()
            server.server_close()
            app.close()

    def test_negative_content_length_400(self, server_fixture):
        """'Content-Length: -1' must 400 immediately — a negative length
        would turn rfile.read() into read-until-EOF on a connection the
        client keeps open, leaking the handler thread."""
        import socket

        _, _, port = server_fixture
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(b"POST /v1/score HTTP/1.1\r\n"
                      b"Host: x\r\nContent-Length: -1\r\n\r\n")
            s.settimeout(10)          # reply must come without a body
            head = s.recv(4096)
        assert b" 400 " in head.split(b"\r\n", 1)[0], head[:200]

    def test_queue_overflow_backpressure(self):
        """submit() raises QueueFull beyond max_pending; callers get 429."""
        import time as _time

        from m3p_tpu.serve.batcher import MicroBatcher, QueueFull

        started = threading.Event()

        def slow_handler(items):
            started.set()
            _time.sleep(0.3)
            return [0.0] * len(items)

        b = MicroBatcher(slow_handler, max_batch=1, max_wait_s=0.001,
                         max_pending=2)
        try:
            b.submit(1)           # picked up by the worker
            started.wait(5.0)
            b.submit(2)           # queued
            b.submit(3)           # queued (at limit)
            with pytest.raises(QueueFull):
                for _ in range(8):   # next submits must hit the bound
                    b.submit(4)
        finally:
            b.stop()

    def test_http_429_under_overload(self, engine):
        rng = np.random.RandomState(1)
        server, app = make_server(engine, host="127.0.0.1", port=0,
                                  max_batch=1, max_wait_s=0.001,
                                  max_pending=1)
        import time as _time

        orig = app._score_batcher._handler

        def slow(items):
            _time.sleep(0.4)
            return orig(items)

        app._score_batcher._handler = slow
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        img = _image(rng)
        pair = {"text": "a dog", "feats": img["feats"].tolist(),
                "locs": img["locs"].tolist()}
        statuses = {}

        def hit(i):
            statuses[i] = _post(port, "/v1/score", {"pairs": [pair]})[0]

        try:
            threads = [threading.Thread(target=hit, args=(i,))
                       for i in range(8)]
            for th in threads:
                th.start()
            for th in threads:
                th.join()
            vals = sorted(statuses.values())
            assert 429 in vals, vals          # backpressure engaged
            assert 200 in vals, vals          # and some requests served
            # still healthy afterwards
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=10) as r:
                assert r.status == 200
        finally:
            server.shutdown()
            server.server_close()
            app.close()

    def test_request_timeout_503(self, engine):
        rng = np.random.RandomState(2)
        server, app = make_server(engine, host="127.0.0.1", port=0,
                                  max_batch=1, max_wait_s=0.001,
                                  request_timeout_s=0.05)
        import time as _time

        app._score_batcher._handler = \
            lambda items: (_time.sleep(0.5), [0.0] * len(items))[1]
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        img = _image(rng)
        pair = {"text": "a dog", "feats": img["feats"].tolist(),
                "locs": img["locs"].tolist()}
        try:
            status, out = _post(port, "/v1/score", {"pairs": [pair]})
            assert status == 503 and "timed out" in out["error"]
        finally:
            server.shutdown()
            server.server_close()
            app.close()

    def test_fuzz_survival(self, server_fixture):
        """A loop of garbage requests never kills the server: every response
        is a well-formed JSON error, and /health stays 200 throughout."""
        _, _, port = server_fixture
        rng = np.random.RandomState(3)
        bodies = [
            b"", b"null", b"true", b'"str"', b"[]", b"{}",
            b'{"pairs": null}', b'{"pairs": [{}]}',
            b'{"pairs": [{"text": 5}]}',
            b'{"pairs": [{"text": "x", "feats": "nope"}]}',
            b'{"images": [{"feats": [[1,2],[3]]}]}',
            b'{"text": {}, "top_k": "many"}',
            b'{"texts": ["x"], "tgt_lang": 7}',
            b"\xff\xfe\x00bad utf8",
        ]
        paths = ["/v1/score", "/v1/retrieve", "/v1/caption",
                 "/v1/translate", "/v1/whatever", "/"]
        for i in range(60):
            body = bodies[rng.randint(len(bodies))]
            path = paths[rng.randint(len(paths))]
            status, raw = _post_raw(port, path, body)
            assert 400 <= status < 600, (path, body, status)
            json.loads(raw)  # every error is well-formed JSON
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert r.status == 200


def test_int8_vs_fp_score_ranking_invariance(tmp_path):
    """--eval_quant int8 serving must preserve score RANKING vs the fp
    engine (same checkpoint): retrieval order and top-1 identical, scores
    within int8 quantization tolerance (engine-level check, VERDICT r3
    item 8)."""
    from m3p_tpu.model import quantized_inference_model

    path = str(tmp_path / "unigram.tsv")
    train_unigram(CORPUS, vocab_size=150).save(path)
    tok = XLMRTokenizer(path)
    from m3p_tpu.config import ModelConfig as MC

    cfg = MC(n_words=tok.vocab_size, mask_index=tok.mask_token_id,
             n_langs=3, emb_dim=32, n_layers=2, n_dec_layers=1, n_heads=2,
             dropout=0.0, attention_dropout=0.0, max_region_num=R,
             refine_layers=1, dtype="float32", use_pallas_attention=False)
    model, params = build_model(cfg, jax.random.PRNGKey(0))
    kw = dict(tokenizer=tok, max_regions=R, text_buckets=(8,),
              batch_buckets=(1, 2, 4, 8), beam_size=1, max_gen_len=4,
              lang2id={"en": 0})
    fp = InferenceEngine(model, params, **kw)
    q8 = InferenceEngine(quantized_inference_model(cfg), params, **kw)

    rng = np.random.RandomState(7)
    gallery = [_image(rng) for _ in range(8)]
    ids = [f"img{i}" for i in range(8)]
    fp.load_gallery(gallery, ids)
    q8.load_gallery(gallery, ids)

    for text in ("a dog runs on the beach", "two cats sleep",
                 "a red car on the street"):
        r_fp = fp.retrieve(text, top_k=8)
        r_q8 = q8.retrieve(text, top_k=8)
        s_fp = {r["id"]: r["score"] for r in r_fp}
        s_q8 = {r["id"]: r["score"] for r in r_q8}
        # scores close (int8 tolerance scaled to the observed range)...
        rng_fp = max(s_fp.values()) - min(s_fp.values()) + 1e-6
        for k in s_fp:
            assert abs(s_fp[k] - s_q8[k]) < 0.15 * rng_fp, (k, s_fp, s_q8)
        # ...and the top-1 and full ranking agree up to near-ties
        assert r_fp[0]["id"] == r_q8[0]["id"], (r_fp, r_q8)
        order_fp = [r["id"] for r in r_fp]
        order_q8 = [r["id"] for r in r_q8]
        for a, b in zip(order_fp, order_q8):
            if a != b:
                # a swap is only acceptable between near-tied neighbours
                assert abs(s_fp[a] - s_fp[b]) < 0.05 * rng_fp, (
                    order_fp, order_q8, s_fp)


def test_timed_out_request_is_shed():
    """A caller that times out cancels its queued item: the worker must
    NEVER run the abandoned work (it would burn a device pass and hold
    a max_pending slot for a result nobody reads)."""
    import time as _time

    from m3p_tpu.serve.batcher import MicroBatcher, RequestTimeout

    ran, started = [], threading.Event()

    def handler(items):
        started.set()
        ran.extend(items)
        _time.sleep(0.5)
        return [0.0] * len(items)

    b = MicroBatcher(handler, max_batch=1, max_wait_s=0.001,
                     max_pending=4)
    try:
        b.submit("head")              # occupies the worker
        started.wait(5.0)
        with pytest.raises(RequestTimeout):
            b("abandoned", timeout=0.05)   # queued behind, times out
        _time.sleep(1.2)              # give the worker time to drain
        assert "abandoned" not in ran, ran
    finally:
        b.stop()

def test_handler_timeout_error_is_not_a_request_timeout():
    """A TimeoutError raised BY the handler must propagate as itself
    (py>=3.11 aliases concurrent.futures.TimeoutError to the builtin) —
    only a genuine wait timeout raises RequestTimeout."""
    from m3p_tpu.serve.batcher import MicroBatcher, RequestTimeout

    def handler(items):
        raise TimeoutError("engine-internal socket timeout")

    b = MicroBatcher(handler, max_batch=1, max_wait_s=0.001,
                     max_pending=4)
    try:
        with pytest.raises(TimeoutError, match="engine-internal"):
            b("x", timeout=5.0)
        # and it must NOT be the wait-timeout type
        try:
            b("y", timeout=5.0)
        except RequestTimeout:
            pytest.fail("handler TimeoutError mislabeled as wait timeout")
        except TimeoutError:
            pass
    finally:
        b.stop()

def test_multi_item_requests_get_backpressure(engine):
    """Multi-item /v1/score is admission-controlled too: under overload
    it must 429 instead of fanning unbounded engine calls across HTTP
    threads (the single-item path already did)."""
    import json as _json
    import time as _time
    import urllib.error
    import urllib.request

    rng = np.random.RandomState(2)
    server, app = make_server(engine, host="127.0.0.1", port=0,
                              max_batch=1, max_wait_s=0.001,
                              max_pending=1)
    orig = app._direct_runner._handler

    def slow(thunks):
        _time.sleep(0.5)
        return orig(thunks)

    app._direct_runner._handler = slow
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    img = _image(rng)
    pair = {"feats": img["feats"].tolist(), "locs": img["locs"].tolist()}
    body = _json.dumps(
        {"pairs": [dict(pair, text="a"), dict(pair, text="b")]}).encode()

    codes = []

    def hit():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/score", data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                codes.append(r.status)
        except urllib.error.HTTPError as e:
            codes.append(e.code)

    threads = [threading.Thread(target=hit) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    try:
        assert 429 in codes, codes       # overload must backpressure
        assert 200 in codes, codes       # and some requests succeed
    finally:
        server.shutdown()
        server.server_close()
        app.close()

def test_max_pending_zero_rejected():
    """maxsize<=0 means INFINITE to queue.Queue — the constructor must
    refuse it rather than silently disable the backpressure bound."""
    from m3p_tpu.serve.batcher import MicroBatcher

    # ValueError, not assert: the guard must survive `python -O`
    with pytest.raises(ValueError):
        MicroBatcher(lambda items: items, max_pending=0)
    with pytest.raises(ValueError):
        MicroBatcher(lambda items: items, max_batch=0)
