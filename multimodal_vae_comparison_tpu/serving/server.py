"""Minimal HTTP inference server over the InferenceEngine.

Stdlib-only (no framework deps): POST /generate with a JSON body
``{"inputs": {"mod_1": {"data": [...]}}, "seed": 0}`` returns JSON
reconstructions for every modality; GET /health returns model metadata.

    python -m multimodal_vae_comparison_tpu.serving.server \
        --model results/<exp>/version_0 --port 8500
"""
from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_handler(engine, infer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {
                    "status": "ok",
                    "model": type(infer.model).__name__,
                    "modalities": list(infer.mod_names),
                    "n_latents": infer.model.n_latents,
                })
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                inputs = {}
                for name, mod in req["inputs"].items():
                    entry = {"data": np.asarray(mod["data"], np.float32)}
                    if mod.get("masks") is not None:
                        entry["masks"] = np.asarray(mod["masks"], bool)
                    inputs[name] = entry
                out = engine.generate(inputs, seed=int(req.get("seed", 0)))
                self._send(200, {k: v.tolist() for k, v in out.items()})
            except (KeyError, ValueError, TypeError,
                    json.JSONDecodeError) as e:
                # malformed request (bad json, unknown modality, shape
                # disagreement — the engine's own input validation)
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                # anything else is a server-side failure, not client error
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(model_dir: str, port: int = 8500):
    from multimodal_vae_comparison_tpu.eval.infer import MultimodalVAEInfer
    from multimodal_vae_comparison_tpu.serving.engine import InferenceEngine
    infer = MultimodalVAEInfer(model_dir)
    engine = InferenceEngine(infer)
    server = ThreadingHTTPServer(("127.0.0.1", port),
                                 make_handler(engine, infer))
    print(f"serving {model_dir} on http://127.0.0.1:{port}")
    server.serve_forever()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--port", type=int, default=8500)
    args = parser.parse_args()
    serve(args.model, args.port)


if __name__ == "__main__":
    main()
