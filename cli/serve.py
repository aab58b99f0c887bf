#!/usr/bin/env python
"""Stateful streaming detection server over an exported artifact.

Loads a `cli/export.py` artifact (or builds the step live from a
checkpoint), wraps it in the micro-batching ServingEngine
(leod_tpu/serve.py), and exposes a minimal stdlib HTTP API:

    GET  /v1/health
        -> {"status": "ok", "steps": N, "streams": n, "slots": B, ...}
    POST /v1/detect   {"stream": "<id>", "frame_b64": "<base64 bytes>"}
        -> {"boxes": [[x0, y0, x1, y1, obj_conf, cls_conf, cls_id], ...],
            "classes": [...]}

`frame_b64` is the raw little-endian bytes of one uint8 frame with the
shape the artifact was exported for (`<artifact>.json` "frame_shape" —
raw [H, W, C] with --raw-layout, otherwise the prefolded space-to-depth
layout [H/4, W/4, 16C]; leod_tpu/serve.py serve_input_shape). Streams
keep their LSTM state across requests; a stream id unseen since its
slot was evicted starts fresh.

Example:
    python cli/export.py --synthetic --size tiny --cpu --out /tmp/m.hlo
    python cli/serve.py --artifact /tmp/m.hlo --cpu --port 8000
"""
import argparse
import base64
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_server(engine, meta, host: str = "0.0.0.0", port: int = 8000):
    """ThreadingHTTPServer bound to (host, port); port 0 = ephemeral."""
    classes = meta.get("classes", [])
    frame_shape = tuple(meta.get("frame_shape", engine.frame_shape))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet access log
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/v1/health":
                self._reply(200, {"status": "ok", **engine.stats(),
                                  "frame_shape": list(frame_shape),
                                  "classes": classes})
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            if self.path != "/v1/detect":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                raw = base64.b64decode(req["frame_b64"])
                frame = np.frombuffer(raw, np.uint8).reshape(frame_shape)
            except (KeyError, TypeError, ValueError,
                    json.JSONDecodeError) as e:
                self._reply(400, {"error": str(e)})
                return
            try:
                dets = engine.detect(str(req.get("stream", "default")),
                                     frame)
            except ValueError as e:             # bad frame shape/dtype
                self._reply(400, {"error": str(e)})
                return
            except Exception as e:  # engine closed / timeout / step crash
                # a JSON 5xx keeps the error contract; letting it escape
                # would reset the socket with no body
                self._reply(503, {"error": f"{type(e).__name__}: {e}"})
                return
            self._reply(200, {"boxes": [[round(float(v), 4) for v in row]
                                        for row in dets],
                              "classes": classes})

    return ThreadingHTTPServer((host, port), Handler)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=None,
                    help="exported .stablehlo from cli/export.py")
    ap.add_argument("--ckpt", default=None,
                    help="build the step live from a checkpoint instead")
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base", choices=["tiny", "small", "base"])
    ap.add_argument("--batch-size", type=int, default=None,
                    help="stream slots (live --ckpt mode only, default 16; "
                         "artifacts carry their exported batch size)")
    ap.add_argument("--conf", type=float, default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-wait-ms", type=float, default=2.0,
                    help="micro-batch coalescing window")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from leod_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from leod_tpu.serve import (ServingEngine, artifact_meta,
                                load_artifact_exported, make_serve_step,
                                serve_input_shape, zero_states_like)

    if args.artifact:
        # these knobs are baked into an exported program at export time —
        # accepting them here would silently serve different behavior
        # than the operator asked for
        if args.conf is not None or args.fp32 or args.batch_size:
            ap.error("--conf/--fp32/--batch-size are fixed at export "
                     "time; re-export with cli/export.py or serve live "
                     "via --ckpt")
        exported, meta = load_artifact_exported(args.artifact)
        step_fn = jax.jit(exported.call)
        states = zero_states_like(exported)
        frame_shape = tuple(meta["frame_shape"]) if "frame_shape" in meta \
            else None
        if frame_shape is None:
            # fall back to the exported ev aval (args[1])
            tree_args, _ = jax.tree.unflatten(exported.in_tree,
                                              list(exported.in_avals))
            frame_shape = tuple(tree_args[1].shape[1:])
    elif args.ckpt:
        from leod_tpu.config import derive, experiment_preset
        from leod_tpu.models.detector import Detector
        from leod_tpu.train.trainer import load_variables

        if args.batch_size is None:
            args.batch_size = 16
        cfg = derive(experiment_preset(args.dataset, args.size))
        det = Detector(cfg.model,
                       dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
        variables = load_variables(args.ckpt)
        step_fn = jax.jit(make_serve_step(det, variables, args.conf))
        states = det.init_states(args.batch_size)
        frame_shape = serve_input_shape(cfg, args.batch_size)[1:]
        meta = artifact_meta(cfg, args.batch_size, fold=True,
                             conf_threshold=args.conf)
    else:
        ap.error("need --artifact or --ckpt")
        return

    engine = ServingEngine(step_fn, states, frame_shape,
                           max_wait_ms=args.max_wait_ms)
    server = make_server(engine, meta, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"serving {meta.get('dataset', '?')} on http://{host}:{port} "
          f"({engine.batch_size} stream slots, frame shape {frame_shape})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.close()


if __name__ == "__main__":
    main()
