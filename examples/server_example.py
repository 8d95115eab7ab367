"""Serve a model over the OpenAI-compatible HTTP API and query it.

Starts `minivllm_tpu.server` in-process on an ephemeral port, issues a
completion, a chat completion, and a streaming request against it, then
shuts down. With --serve-only it stays up for manual curl use.
"""

from __future__ import annotations

import json
import threading
import urllib.request

from common import base_parser, resolve_model


def post(base: str, path: str, body: dict):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=300)


def main() -> None:
    p = base_parser(__doc__)
    p.add_argument("--port", type=int, default=0)
    p.add_argument("--serve-only", action="store_true")
    args = p.parse_args()
    model = resolve_model(args.model)

    from minivllm_tpu import Config
    from minivllm_tpu.server import AsyncEngine, create_server
    from minivllm_tpu.utils.testing import make_tiny_tokenizer

    import pathlib

    if not (pathlib.Path(model) / "tokenizer.json").exists():
        try:
            make_tiny_tokenizer(model)
        except OSError:
            pass

    cfg = Config(model=model, max_num_seqs=8, max_model_len=512,
                 max_num_batched_tokens=512)
    eng = AsyncEngine(cfg)
    server = create_server(eng, host="127.0.0.1", port=args.port)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    print(f"[server] listening on {base}")
    if args.serve_only:
        server.serve_forever()
        return
    threading.Thread(target=server.serve_forever, daemon=True).start()

    with post(base, "/v1/completions", {
        "prompt": "hello world", "max_tokens": args.max_tokens,
        "temperature": 0.7, "top_p": 0.95,
    }) as r:
        out = json.load(r)
    print("[completions]", out["choices"][0]["text"][:80],
          out["usage"])

    with post(base, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello world"}],
        "max_tokens": args.max_tokens,
    }) as r:
        out = json.load(r)
    print("[chat]", out["choices"][0]["message"]["content"][:80])

    with post(base, "/v1/completions", {
        "prompt": "the quick brown", "max_tokens": args.max_tokens,
        "stream": True,
    }) as r:
        chunks = 0
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks += 1
    print(f"[stream] received {chunks} SSE chunks")

    server.shutdown()
    eng.shutdown()


if __name__ == "__main__":
    main()
