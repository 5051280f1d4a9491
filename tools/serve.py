#!/usr/bin/env python
"""Minimal HTTP inference server.

TPU-native replacement for the reference's torchserve deployment path
(`tools/deployment/mmdet2torchserve.py` + `mmdet_handler.py`): loads a
config (+ checkpoint), jit-compiles the end-to-end predictor once, and
serves detections over HTTP.

    POST /predict      body = image bytes (png/jpg)
        -> {"boxes": [[x1,y1,x2,y2],...], "scores": [...],
            "labels": [...], "class_names": [...]}
    GET  /healthz      -> {"status": "ok"}

Multimodal streams can be sent as a multipart-free simple protocol:
POST /predict_multi with a json body
    {"img": <b64 png>, "mods": [<b64 png>, ...]}
(sensor PNGs are the offline uint16 projections; dequantization happens
server-side via the standard loading pipeline).

Usage:
    python tools/serve.py <config> --checkpoint ckpt.msgpack --port 8500
    curl -X POST --data-binary @img.jpg localhost:8500/predict
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import base64
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_handler(detector, class_names, dequant):
    import cv2

    from hrfuser_tpu.apis.inference import inference_detector

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, payload):
            blob = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(blob)))
            self.end_headers()
            self.wfile.write(blob)

        def log_message(self, fmt, *a):            # quiet access log
            pass

        def do_GET(self):
            if self.path == '/healthz':
                self._json(200, {'status': 'ok'})
            else:
                self._json(404, {'error': 'unknown path'})

        def _decode_img(self, data, flags=cv2.IMREAD_COLOR):
            arr = np.frombuffer(data, np.uint8)
            img = cv2.imdecode(arr, flags)
            if img is None:
                raise ValueError('undecodable image payload')
            return img

        def do_POST(self):
            try:
                n = int(self.headers.get('Content-Length', 0))
                body = self.rfile.read(n)
                t0 = time.time()
                if self.path == '/predict':
                    img = self._decode_img(body)
                    det = inference_detector(detector, img)
                elif self.path == '/predict_multi':
                    req = json.loads(body)
                    img = self._decode_img(base64.b64decode(req['img']))
                    mods = [dequant(self._decode_img(
                        base64.b64decode(m), cv2.IMREAD_UNCHANGED))
                        for m in req.get('mods', [])]
                    det = inference_detector(detector, img, mods or None)
                else:
                    self._json(404, {'error': 'unknown path'})
                    return
                self._json(200, {
                    'boxes': np.round(det['boxes'], 2).tolist(),
                    'scores': np.round(det['scores'], 4).tolist(),
                    'labels': det['labels'].tolist(),
                    'class_names': [class_names[i]
                                    for i in det['labels']],
                    'latency_ms': round((time.time() - t0) * 1e3, 1),
                })
            except Exception as e:                 # noqa: BLE001
                self._json(400, {'error': str(e)})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('--checkpoint', default=None)
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8500)
    ap.add_argument('--input-hw', type=int, nargs=2, default=None)
    args = ap.parse_args()

    from hrfuser_tpu.apis.inference import init_detector
    from hrfuser_tpu.data.projection import dequantize

    detector = init_detector(args.config, args.checkpoint,
                             input_hw=tuple(args.input_hw)
                             if args.input_hw else (384, 640))
    classes = list(detector.cfg.data.classes)

    def dequant(sensor_png):
        if sensor_png.dtype == np.uint16:
            return dequantize(sensor_png.astype(np.float32))
        return sensor_png.astype(np.float32)

    # warm the compile before accepting traffic
    import cv2
    dummy = np.zeros((360, 640, 3), np.uint8)
    t0 = time.time()
    from hrfuser_tpu.apis.inference import inference_detector
    nmod = detector.cfg.model.backbone.num_fused_modalities
    mods = [np.zeros((360, 640, c), np.float32)
            for c in detector.cfg.model.backbone.mod_in_channels][:nmod]
    inference_detector(detector, dummy, mods or None)
    print(f'[serve] model compiled in {time.time() - t0:.1f}s; '
          f'{len(classes)} classes')
    del cv2

    server = ThreadingHTTPServer(
        (args.host, args.port),
        build_handler(detector, classes, dequant))
    print(f'[serve] listening on http://{args.host}:{args.port} '
          f'(POST /predict, /predict_multi; GET /healthz)')
    server.serve_forever()


if __name__ == '__main__':
    main()
