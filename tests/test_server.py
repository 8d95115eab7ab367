"""HTTP serving front-end tests (beyond reference parity — the reference
has no serving API, SURVEY.md §0). Exercises the OpenAI-compatible
routes over a real socket with the engine on a tiny random checkpoint."""

import json
import threading
import urllib.request
import urllib.error

import pytest

from minivllm_tpu import Config, SamplingParams
from minivllm_tpu.server import AsyncEngine, create_server, _truncate_at_stop
from minivllm_tpu.utils.testing import make_tiny_checkpoint, make_tiny_tokenizer


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = tmp_path_factory.mktemp("srv") / "m"
    make_tiny_checkpoint("qwen3", d)
    make_tiny_tokenizer(d)
    cfg = Config(
        model=str(d), max_num_seqs=4, max_model_len=128,
        max_num_batched_tokens=128, kvcache_block_size=16,
        num_kvcache_blocks=32, dtype="float32", attention_impl="xla",
    )
    eng = AsyncEngine(cfg)
    server = create_server(eng, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, eng
    server.shutdown()
    eng.shutdown()


def get(base, path):
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return r.status, json.loads(r.read())


def post(base, path, body, timeout=300):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_models_stats(served):
    base, _ = served
    assert get(base, "/health") == (200, {"status": "ok"})
    code, models = get(base, "/v1/models")
    assert code == 200 and models["data"][0]["object"] == "model"
    code, stats = get(base, "/stats")
    assert code == 200 and "num_preemptions" in stats


def test_completions_greedy_deterministic(served):
    base, _ = served
    body = {"prompt": "hello world the", "max_tokens": 6, "temperature": 0.0}
    code, r1 = post(base, "/v1/completions", body)
    assert code == 200, r1
    assert r1["object"] == "text_completion"
    assert r1["usage"]["completion_tokens"] == 6
    assert r1["choices"][0]["finish_reason"] == "length"
    code, r2 = post(base, "/v1/completions", body)
    assert r2["choices"][0]["text"] == r1["choices"][0]["text"]


def test_concurrent_requests_batch(served):
    base, eng = served
    results = {}

    def go(i):
        results[i] = post(base, "/v1/completions", {
            "prompt": f"the quick brown fox w{i}",
            "max_tokens": 8, "temperature": 0.0,
        })

    threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i in range(3):
        code, r = results[i]
        assert code == 200 and r["usage"]["completion_tokens"] == 8


def test_chat_completions(served):
    base, _ = served
    code, r = post(base, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 4, "temperature": 0.0,
    })
    assert code == 200, r
    assert r["object"] == "chat.completion"
    assert r["choices"][0]["message"]["role"] == "assistant"


def test_streaming_matches_nonstream(served):
    base, _ = served
    body = {"prompt": "lazy dog sat", "max_tokens": 6, "temperature": 0.0}
    _, full = post(base, "/v1/completions", body)
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({**body, "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    text, done, finish = "", False, None
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
                break
            evt = json.loads(payload)
            ch = evt["choices"][0]
            text += ch.get("text", "")
            if ch["finish_reason"]:
                finish = ch["finish_reason"]
    assert done and finish == "length"
    assert text == full["choices"][0]["text"]


def test_stream_detok_is_incremental(served):
    """The SSE path detokenizes incrementally: per-chunk tokenizer work
    is O(new tokens) — no call re-renders the whole completion — while
    the reassembled text stays byte-identical to the non-streamed run
    (the O(n^2) full re-decode per chunk was VERDICT r4 weak #1)."""
    base, eng = served
    body = {"prompt": "the quick brown fox", "max_tokens": 24,
            "temperature": 0.0, "ignore_eos": True}
    _, full = post(base, "/v1/completions", body)
    tok = eng.engine.tokenizer
    calls: list[int] = []
    orig_convert = tok.convert_ids_to_tokens
    orig_decode = tok.decode

    def counting_convert(ids, *a, **k):
        calls.append(len(ids) if isinstance(ids, (list, tuple)) else 1)
        return orig_convert(ids, *a, **k)

    def counting_decode(ids, *a, **k):
        if isinstance(ids, (list, tuple)):
            calls.append(len(ids))
        return orig_decode(ids, *a, **k)

    tok.convert_ids_to_tokens = counting_convert
    tok.decode = counting_decode
    try:
        req = urllib.request.Request(
            base + "/v1/completions",
            data=json.dumps({**body, "stream": True}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        text = ""
        with urllib.request.urlopen(req, timeout=300) as r:
            for raw in r:
                line = raw.decode().strip()
                if not line.startswith("data: "):
                    continue
                payload = line[len("data: "):]
                if payload == "[DONE]":
                    break
                text += json.loads(payload)["choices"][0].get("text", "")
    finally:
        tok.convert_ids_to_tokens = orig_convert
        tok.decode = orig_decode
    assert text == full["choices"][0]["text"]
    # Every tokenizer call during the stream saw at most one multi-step
    # window of new ids, never the accumulated completion: with 24
    # tokens the old full-re-decode path ends with a 24-id call.
    assert calls, "stream produced no tokenizer work"
    assert max(calls) < 24, f"detok call saw {max(calls)} ids (full re-decode?)"


def test_stop_terminates_generation_nonstream(served):
    """`stop` must END generation at the match (engine-level), not just
    truncate the response text: completion_tokens stays far below
    max_tokens and the engine is idle right after the response."""
    base, eng = served
    tok = eng.engine.tokenizer
    body = {"prompt": "hello world", "max_tokens": 48, "temperature": 0.0,
            "ignore_eos": True}
    _, full = post(base, "/v1/completions", body)
    assert full["usage"]["completion_tokens"] == 48
    # a word the model actually generates, mid-completion
    words = full["choices"][0]["text"].split()
    word = words[5]
    code, r = post(base, "/v1/completions", {**body, "stop": word})
    assert code == 200, r
    assert r["choices"][0]["finish_reason"] == "stop"
    assert r["choices"][0]["stop_reason"] == word
    assert word not in r["choices"][0]["text"]
    assert full["choices"][0]["text"].startswith(r["choices"][0]["text"])
    # terminated within one decode window of the match — not at 48
    n = r["usage"]["completion_tokens"]
    assert n < 24, f"stop did not terminate generation ({n} tokens)"
    assert eng.engine.is_finished(), "request still decoding after stop"


def test_stop_terminates_generation_stream(served):
    """Streaming stop: the SSE stream ends at the match AND the request
    is actually finished (blocks freed) — the regression left it
    decoding to max_tokens invisibly with KV blocks held."""
    base, eng = served
    body = {"prompt": "lazy dog sat", "max_tokens": 48, "temperature": 0.0,
            "ignore_eos": True}
    _, full = post(base, "/v1/completions", body)
    word = full["choices"][0]["text"].split()[4]
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({**body, "stop": word, "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    text, finish = "", None
    with urllib.request.urlopen(req, timeout=300) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            ch = json.loads(payload)["choices"][0]
            text += ch.get("text", "")
            if ch["finish_reason"]:
                finish = ch["finish_reason"]
    assert finish == "stop"
    assert word not in text
    # no invisible post-stop decoding: the engine drains promptly (the
    # abort/finish lands at the next loop iteration)
    import time as _t
    deadline = _t.monotonic() + 10
    while not eng.engine.is_finished() and _t.monotonic() < deadline:
        _t.sleep(0.05)
    assert eng.engine.is_finished(), "request still decoding after stop"
    bm = eng.engine.scheduler.block_manager
    assert bm.num_free_blocks == bm.num_blocks  # all KV blocks freed


def test_stop_token_ids_http(served):
    base, eng = served
    body = {"prompt": "hello world", "max_tokens": 48, "temperature": 0.0,
            "ignore_eos": True}
    _, full = post(base, "/v1/completions", body)
    tok = eng.engine.tokenizer
    ids = tok.encode(full["choices"][0]["text"])
    target = ids[6]
    code, r = post(base, "/v1/completions",
                   {**body, "stop_token_ids": [target]})
    assert code == 200, r
    assert r["choices"][0]["finish_reason"] == "stop"
    assert r["choices"][0]["stop_reason"] == target
    assert r["usage"]["completion_tokens"] == ids.index(target) + 1


def test_n_choices_nonstream(served):
    """OpenAI `n`: one request returns n choices; greedy siblings are
    identical to the n=1 completion (KV-forked, same stream)."""
    base, eng = served
    body = {"prompt": "hello world the quick", "max_tokens": 6,
            "temperature": 0.0, "ignore_eos": True}
    _, single = post(base, "/v1/completions", body)
    code, r = post(base, "/v1/completions", {**body, "n": 3})
    assert code == 200, r
    assert [c["index"] for c in r["choices"]] == [0, 1, 2]
    for c in r["choices"]:
        assert c["text"] == single["choices"][0]["text"]
    assert r["usage"]["completion_tokens"] == 18
    assert eng.engine.is_finished()


def test_n_choices_stream(served):
    """Streaming n=2: deltas carry per-sibling indexes, every sibling
    gets a finish chunk, and reassembled texts match non-streaming."""
    base, _ = served
    body = {"prompt": "lazy dog sat on", "max_tokens": 5,
            "temperature": 0.0, "ignore_eos": True}
    _, full = post(base, "/v1/completions", {**body, "n": 2})
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({**body, "n": 2, "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    texts = {0: "", 1: ""}
    finishes = {}
    with urllib.request.urlopen(req, timeout=300) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            ch = json.loads(payload)["choices"][0]
            texts[ch["index"]] += ch.get("text", "")
            if ch["finish_reason"]:
                finishes[ch["index"]] = ch["finish_reason"]
    assert set(finishes) == {0, 1}
    for i in (0, 1):
        assert texts[i] == full["choices"][i]["text"]


def test_best_of_http(served):
    """best_of generates best_of completions, returns the top n by
    cumulative logprob; usage counts every generated token; streaming
    with best_of > n is rejected."""
    base, eng = served
    body = {"prompt": "hello world", "max_tokens": 5, "temperature": 1.0,
            "ignore_eos": True, "seed": 3, "best_of": 3}
    code, r = post(base, "/v1/completions", body)
    assert code == 200, r
    assert len(r["choices"]) == 1
    assert "logprobs" not in r["choices"][0]  # forced for ranking only
    assert r["usage"]["completion_tokens"] == 15  # all 3 generated
    code, r = post(base, "/v1/completions", {**body, "stream": True})
    assert code == 400 and "best_of" in r["error"]["message"]
    assert eng.engine.is_finished()


def test_error_paths(served):
    base, _ = served
    code, r = post(base, "/v1/completions", {"max_tokens": 4})
    assert code == 400 and "prompt" in r["error"]["message"]
    code, r = post(base, "/v1/completions",
                   {"prompt": "x", "temperature": -1})
    assert code == 400
    code, r = post(base, "/nope", {})
    assert code == 404


def test_truncate_at_stop():
    assert _truncate_at_stop("abc def", ["def"]) == ("abc ", True)
    assert _truncate_at_stop("abc def", ["zz"]) == ("abc def", False)
    assert _truncate_at_stop("abcdef", ["cd", "ef"]) == ("ab", True)


def test_completions_logprobs(served):
    base, _ = served
    code, r = post(base, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 4, "temperature": 0.0,
        "logprobs": 2,
    })
    assert code == 200, r
    lp = r["choices"][0]["logprobs"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) == 4
    assert all(isinstance(v, float) and v <= 0.0 for v in lp["token_logprobs"])
    # distinct ids may decode to the same string and merge (OpenAI's
    # string-keyed format), so up to 2 entries
    assert all(1 <= len(d) <= 2 for d in lp["top_logprobs"])


def test_logprobs_boolean_and_chat_shape(served):
    base, _ = served
    # boolean false must NOT enable logprobs
    code, r = post(base, "/v1/completions", {
        "prompt": "hello world", "max_tokens": 2, "temperature": 0.0,
        "logprobs": False,
    })
    assert code == 200 and "logprobs" not in r["choices"][0]
    # chat uses boolean true + top_logprobs and the chat response shape
    code, r = post(base, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": 3, "temperature": 0.0,
        "logprobs": True, "top_logprobs": 2,
    })
    assert code == 200, r
    content = r["choices"][0]["logprobs"]["content"]
    assert len(content) == 3
    for e in content:
        assert set(e) == {"token", "logprob", "top_logprobs"}
        assert len(e["top_logprobs"]) == 2


def test_echo_returns_prompt_and_prompt_logprobs(served):
    base, _ = served
    prompt = "hello world the"
    # echo alone: response text starts with the prompt
    code, r = post(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 3, "temperature": 0.0, "echo": True,
    })
    assert code == 200, r
    assert r["choices"][0]["text"].startswith(prompt)
    assert "logprobs" not in r["choices"][0]
    # echo + logprobs: OpenAI semantics — prompt tokens included in the
    # logprobs arrays, first entry null (no prefix to condition on)
    code, r = post(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 3, "temperature": 0.0,
        "echo": True, "logprobs": 1,
    })
    assert code == 200, r
    choice = r["choices"][0]
    assert choice["text"].startswith(prompt)
    lp = choice["logprobs"]
    n_prompt = r["usage"]["prompt_tokens"]
    assert len(lp["tokens"]) == n_prompt + 3
    assert lp["token_logprobs"][0] is None
    assert lp["top_logprobs"][0] is None
    assert all(
        isinstance(v, float) and v <= 0.0 for v in lp["token_logprobs"][1:]
    )


def test_echo_streaming(served):
    import urllib.request as _rq

    base, _ = served
    body = {
        "prompt": "hello world", "max_tokens": 3, "temperature": 0.0,
        "echo": True, "stream": True,
    }
    req = _rq.Request(
        base + "/v1/completions", data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    texts = []
    with _rq.urlopen(req, timeout=300) as resp:
        for line in resp:
            line = line.decode().strip()
            if not line.startswith("data:"):
                continue
            payload = line[len("data:"):].strip()
            if payload == "[DONE]":
                break
            texts.append(json.loads(payload)["choices"][0].get("text", ""))
    # first streamed chunk is the echoed prompt
    assert texts and texts[0] == "hello world"


# -- abort on disconnect -------------------------------------------------


@pytest.fixture(scope="module")
def slow_served(tmp_path_factory):
    """Server whose engine steps are artificially slowed (50 ms) and
    fused multi-step decode disabled (one token per step), so a
    max_tokens=120 generation takes ~6 s — disconnect detection (0.25 s
    poll / next-write error) deterministically beats it."""
    import time as _time

    d = tmp_path_factory.mktemp("slow") / "m"
    make_tiny_checkpoint("qwen3", d)
    make_tiny_tokenizer(d)
    cfg = Config(
        model=str(d), max_num_seqs=4, max_model_len=256,
        max_num_batched_tokens=256, kvcache_block_size=16,
        num_kvcache_blocks=64, dtype="float32", attention_impl="xla",
        decode_multi_step=1,
    )
    eng = AsyncEngine(cfg)
    orig_step = eng.engine.step

    def slow_step():
        _time.sleep(0.05)
        return orig_step()

    eng.engine.step = slow_step
    server = create_server(eng, host="127.0.0.1", port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, eng
    server.shutdown()
    eng.shutdown()


def _wait_idle(eng, timeout=15.0):
    import time as _time

    t0 = _time.monotonic()
    while _time.monotonic() - t0 < timeout:
        if eng.engine.is_finished():
            return True
        _time.sleep(0.05)
    return False


def test_async_engine_abort_api(slow_served):
    _, eng = slow_served
    req = eng.submit([5, 6, 7], SamplingParams(
        temperature=0.0, max_tokens=120, ignore_eos=True))
    first = req.chunks.get(timeout=30)  # wait until it is producing
    assert first is not None
    before = eng.num_aborted
    eng.abort(req)
    assert _wait_idle(eng), "engine still busy after abort"
    assert eng.num_aborted == before + 1
    # waiter unblocks (partial tokens, no error)
    toks = eng.result(req, timeout=5)
    assert isinstance(toks, list)


def test_nonstream_disconnect_frees_request(slow_served):
    import socket as _socket

    base, eng = slow_served
    host, port = base.replace("http://", "").split(":")
    body = json.dumps({
        "prompt": [5, 6, 7], "max_tokens": 120,
        "temperature": 0.0, "ignore_eos": True,
    }).encode()
    before = eng.num_aborted
    s = _socket.create_connection((host, int(port)))
    s.sendall(
        b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    # give the handler a beat to admit the request, then vanish
    import time as _time

    _time.sleep(0.4)
    s.close()
    assert _wait_idle(eng), "abandoned request kept decoding"
    assert eng.num_aborted == before + 1


def test_stream_disconnect_frees_request(slow_served):
    import socket as _socket
    import time as _time

    base, eng = slow_served
    host, port = base.replace("http://", "").split(":")
    body = json.dumps({
        "prompt": [8, 9], "max_tokens": 120, "temperature": 0.0,
        "ignore_eos": True, "stream": True,
    }).encode()
    before = eng.num_aborted
    s = _socket.create_connection((host, int(port)))
    s.sendall(
        b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    s.recv(4096)  # read headers/first chunk so the stream is live
    # RST on close (SO_LINGER 0): a plain FIN lets small SSE writes keep
    # landing in the TCP buffer for a while, so under a loaded machine
    # the generation could finish before any write failed (flaky).
    s.setsockopt(
        _socket.SOL_SOCKET, _socket.SO_LINGER,
        __import__("struct").pack("ii", 1, 0),
    )
    s.close()  # server's next SSE write raises -> abort
    assert _wait_idle(eng), "abandoned stream kept decoding"
    assert eng.num_aborted == before + 1
