"""Online serving: an HTTP JSON endpoint over an exported artifact.

The reference's only inference path is re-running model code inside a
notebook (`basic_vqa/model-eval.ipynb`); this module is the production
counterpart on top of `lctvqa/export.py` artifacts — TPU-native in the
way that matters for serving:

- **Micro-batched dispatch.** Concurrent requests arriving within a
  small window are fused into ONE batched call on the batch-symbolic
  artifact, so online traffic rides the MXU as a single large-batch
  program instead of many batch-1 programs (the serving sweep in
  NOTES.md: 64 -> 1024 batch is 21.6k -> 38.7k pairs/s on a v5e).
- **Bucketed batch shapes.** Dispatch batches are padded up to the next
  power of two, bounding the number of XLA specializations of the
  symbolic-batch program to log2(max_batch) + 1.
- **Zero model code.** Everything the server needs — the StableHLO
  programs, the param tree, the vocab word lists — is inside the
  artifact; tokenization mirrors `data/preprocess.encode_question`
  (<start> tok... <end>, <pad>=0, unknown -> 0).

Endpoints (JSON in, JSON out):

- `GET  /healthz`  -> {"ok", "family", "functions"}
- `GET  /meta`     -> artifact meta (word lists replaced by their sizes)
- `POST /answer`   -> {"image_b64"|"image", "question"} -> {"answer"}
                      (W/EF artifacts)
- `POST /generate` -> {"image_b64"|"image"} -> EF: {"question","answer"};
                      unified: {"qa", "answer"}

Images: base64 of an encoded image file (decoded + resized via PIL), or
base64 of raw uint8 RGB bytes of exactly img_size*img_size*3, or a
nested uint8 list of shape [img_size, img_size, 3].
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np


class MicroBatcher:
    """Fuses concurrent single-sample calls into batched artifact calls.

    `call()` blocks the request thread until its row of the batched
    result is ready. One dispatcher thread drains the queue: it waits up
    to `window_ms` after the first pending request (skipped when the
    queue is already non-empty), groups by function name, pads each
    group to the next power of two, and runs one program per group.
    """

    def __init__(self, model, window_ms: float = 5.0, max_batch: int = 64):
        self._model = model
        self._window_s = window_ms / 1e3
        self._max_batch = max_batch
        self._q: queue.Queue = queue.Queue()
        self.batch_sizes: list = []  # observed dispatch sizes (stats)
        threading.Thread(target=self._loop, daemon=True).start()

    def call(self, fn_name: str, *arrays):
        ev = threading.Event()
        slot: Dict[str, Any] = {}
        self._q.put((fn_name, arrays, ev, slot))
        ev.wait()
        if "err" in slot:
            raise RuntimeError(slot["err"])
        return slot["out"]

    def _loop(self):
        import jax

        while True:
            items = [self._q.get()]
            deadline = time.monotonic() + self._window_s
            while len(items) < self._max_batch:
                left = deadline - time.monotonic()
                if left <= 0 and self._q.empty():
                    break
                try:
                    items.append(self._q.get(timeout=max(left, 0)))
                except queue.Empty:
                    break
            by_fn: Dict[str, list] = {}
            for it in items:
                by_fn.setdefault(it[0], []).append(it)
            for fn_name, group in by_fn.items():
                n = len(group)
                self.batch_sizes.append(n)
                try:
                    # bucket the batch: pad with repeats of row 0 so the
                    # symbolic-batch program specializes to few shapes
                    b = 1 << (n - 1).bit_length()
                    args = []
                    for k in range(len(group[0][1])):
                        rows = [g[1][k] for g in group]
                        rows += [rows[0]] * (b - n)
                        args.append(np.stack(rows))
                    out = self._model._fns[fn_name](self._model._params,
                                                    *args)
                    out = jax.tree_util.tree_map(np.asarray, out)
                    for i, (_, _, ev, slot) in enumerate(group):
                        slot["out"] = jax.tree_util.tree_map(
                            lambda a: a[i], out)
                        ev.set()
                except Exception as e:  # report to every waiter
                    for _, _, ev, slot in group:
                        slot["err"] = f"{type(e).__name__}: {e}"
                        ev.set()


class VqaService:
    """Request decoding + response encoding around a ServingModel."""

    def __init__(self, model, window_ms: float = 5.0, max_batch: int = 64):
        from lctvqa.text import VocabDict

        self.model = model
        self.meta = model.meta
        self.batcher = MicroBatcher(model, window_ms, max_batch)
        self._qst_vocab = (VocabDict(word_list=self.meta["qst_words"])
                           if self.meta.get("qst_words") else None)
        self._ans_words = self.meta.get("ans_words")
        self._uni_words = self.meta.get("unified_words")

    # -- input decoding ---------------------------------------------------

    def _decode_image(self, payload: Dict[str, Any]) -> np.ndarray:
        s = self.meta["img_size"]
        if "image_b64" in payload:
            raw = base64.b64decode(payload["image_b64"])
            try:
                from PIL import Image
                im = Image.open(io.BytesIO(raw)).convert("RGB")
                im = im.resize((s, s))  # data/preprocess.resize_images_dir
                return np.asarray(im, np.uint8)
            except Exception:
                arr = np.frombuffer(raw, np.uint8)
                if arr.size != s * s * 3:
                    raise ValueError(
                        f"raw image must be {s}x{s}x3 uint8 "
                        f"({s * s * 3} bytes), got {arr.size}")
                return arr.reshape(s, s, 3)
        arr = np.asarray(payload["image"], np.uint8)
        if arr.shape != (s, s, 3):
            raise ValueError(f"image must have shape ({s},{s},3), "
                             f"got {arr.shape}")
        return arr

    def _encode_question(self, question: str) -> np.ndarray:
        """data/preprocess.encode_question semantics: <start> tok...
        <end>, <pad>=0 tail, unknown tokens -> index 0."""
        if self._qst_vocab is None:
            raise ValueError("artifact was exported without --input_dir; "
                             "no question vocab embedded")
        from lctvqa.text import tokenize
        L = self.meta["max_qst_len"]
        toks = tokenize(question)[:L - 2]
        vec = np.zeros(L, np.int32)
        d = self._qst_vocab.word2idx_dict
        vec[0] = d["<start>"]
        for i, t in enumerate(toks):
            vec[i + 1] = d.get(t, 0)
        vec[len(toks) + 1] = d["<end>"]
        return vec

    # -- endpoints --------------------------------------------------------

    def answer(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        if "answer_logits" not in self.model.functions:
            raise ValueError("unified artifacts answer via POST /generate")
        u8 = self._decode_image(payload)
        qst = self._encode_question(payload["question"])
        logits = self.batcher.call("answer_logits", u8, qst)
        ans_id = int(np.argmax(logits))
        out = {"answer_id": ans_id}
        if self._ans_words:
            out["answer"] = self._ans_words[ans_id]
        return out

    def generate(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        from lctvqa.export import extract_answer_words

        if "generate" not in self.model.functions:
            raise ValueError("W artifacts have no generate function; "
                             "use POST /answer")
        u8 = self._decode_image(payload)
        out = self.batcher.call("generate", u8)
        if self.meta["family"] == "unified":
            if not self._uni_words:
                raise ValueError("no unified vocab embedded in artifact")
            words = [self._uni_words[int(i)] for i in out]
            return {"qa": " ".join(w for w in words
                                   if w not in ("<pad>",)),
                    "answer": extract_answer_words(words)}
        tokens, ans_id = out
        res: Dict[str, Any] = {"answer_id": int(ans_id)}
        if self._qst_vocab is not None:
            res["question"] = self._qst_vocab.arr2qst(tokens)
        if self._ans_words:
            res["answer"] = self._ans_words[int(ans_id)]
        return res

    def warmup(self, max_batch: Optional[int] = None) -> int:
        """Precompile every exported function at every power-of-two batch
        bucket (XLA specializes the symbolic-batch program per concrete
        shape; on a TPU behind a slow compile path this turns first-hit
        multi-second stalls into startup cost). Returns #programs run."""
        import jax

        mb = max_batch or self.batcher._max_batch
        s = self.meta["img_size"]
        L = self.meta["max_qst_len"]
        n = 0
        b = 1
        while b <= mb:
            u8 = np.zeros((b, s, s, 3), np.uint8)
            qst = np.zeros((b, L), np.int32)
            args = {"answer_logits": (u8, qst), "generate": (u8,)}
            for name in self.model.functions:
                out = self.model._fns[name](self.model._params, *args[name])
                # synchronize per program: jit dispatch is async on remote
                # backends, so without this warmup "finishes" while the
                # compiles are still queued and the FIRST live request
                # waits behind all of them (measured: 300+ s stall on a
                # tunneled TPU whose warmup had "completed" in 45 s).
                # A host readback, not block_until_ready: stdio-tunneled
                # backends can return from block_until_ready before the
                # program has even compiled (NOTES.md round-1 quirks;
                # re-measured here as a 17 s first request).
                for leaf in jax.tree_util.tree_leaves(out):
                    np.asarray(leaf)
                n += 1
            b *= 2
        return n

    def healthz(self) -> Dict[str, Any]:
        return {"ok": True, "family": self.meta["family"],
                "functions": self.model.functions,
                "dispatch_batches": len(self.batcher.batch_sizes)}

    def meta_public(self) -> Dict[str, Any]:
        out = dict(self.meta)
        for k in ("qst_words", "ans_words", "unified_words"):
            if k in out:
                out[k.replace("words", "vocab_len")] = len(out.pop(k))
        return out


class _Handler(BaseHTTPRequestHandler):
    service: VqaService  # set on the subclass by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, obj: Dict[str, Any]):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, self.service.healthz())
        elif self.path == "/meta":
            self._send(200, self.service.meta_public())
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        # Compute the response INSIDE the try, send it AFTER: the error
        # paths must fire only for service errors, never for socket-write
        # failures of a successful response (a BrokenPipeError mid-_send
        # answered with a second _send would corrupt a keep-alive stream).
        try:
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            if self.path == "/answer":
                code, obj = 200, self.service.answer(payload)
            elif self.path == "/generate":
                code, obj = 200, self.service.generate(payload)
            else:
                code, obj = 404, {"error": f"unknown path {self.path}"}
        except (ValueError, KeyError, RuntimeError) as e:
            code, obj = 400, {"error": str(e)}
        except Exception:  # noqa: BLE001 — a dropped connection with
            # no response (the default for an uncaught handler error) is
            # strictly worse for the client than a 500 body. The body is
            # generic: exception reprs can leak paths/internals.
            import traceback
            traceback.print_exc()
            code, obj = 500, {"error": "internal server error"}
        self._send(code, obj)


def make_server(artifact_path: str, host: str = "127.0.0.1", port: int = 0,
                window_ms: float = 5.0, max_batch: int = 64,
                trusted: bool = False) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; `.server_address[1]` is
    the bound port (useful with port=0). `trusted` gates loading legacy
    pickle artifacts (the current format is a no-code-execution zip)."""
    from lctvqa.export import load_artifact

    service = VqaService(load_artifact(artifact_path, trusted=trusted),
                         window_ms=window_ms, max_batch=max_batch)
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--artifact", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--window_ms", type=float, default=5.0,
                   help="micro-batching window after the first pending "
                        "request")
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--warmup", action="store_true",
                   help="precompile all batch buckets before accepting "
                        "traffic (slow startup, no first-hit stalls)")
    p.add_argument("--trusted", action="store_true",
                   help="allow loading a LEGACY pickle artifact "
                        "(pickle.load executes code from the file; only "
                        "for artifacts you produced yourself)")
    args = p.parse_args(argv)

    from lctvqa import compile_cache
    compile_cache.enable()
    srv = make_server(args.artifact, args.host, args.port,
                      args.window_ms, args.max_batch,
                      trusted=args.trusted)
    host, port = srv.server_address[:2]
    svc: VqaService = srv.RequestHandlerClass.service  # type: ignore
    if args.warmup:
        n = svc.warmup()
        print(f"warmup: {n} programs compiled", flush=True)
    print(f"serving {svc.meta['family']} artifact ({svc.model.functions}) "
          f"on http://{host}:{port}  window={args.window_ms}ms "
          f"max_batch={args.max_batch}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
