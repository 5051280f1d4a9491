"""Detection visualization (cv2).

Rebuild of the reference's `show_result` / dataset browser surface
(`mmdet/models/detectors/base.py`, `tools/misc/browse_dataset.py`):
draw boxes + class/score labels on images, de-normalize pipeline output
for inspection.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import cv2
import numpy as np

_PALETTE = [(56, 168, 255), (255, 112, 31), (46, 204, 113), (231, 76, 60),
            (155, 89, 182), (241, 196, 15), (52, 152, 219), (230, 126, 34),
            (26, 188, 156), (149, 165, 166)]


def denormalize_image(img: np.ndarray, mean, std,
                      to_rgb: bool = True) -> np.ndarray:
    """Invert the Normalize step -> uint8 BGR for cv2 drawing."""
    out = img * np.asarray(std) + np.asarray(mean)
    if to_rgb:
        out = out[..., ::-1]
    return np.clip(out, 0, 255).astype(np.uint8)


def draw_detections(img: np.ndarray, boxes: np.ndarray,
                    labels: Optional[np.ndarray] = None,
                    scores: Optional[np.ndarray] = None,
                    class_names: Optional[Sequence[str]] = None,
                    score_thr: float = 0.0,
                    thickness: int = 2) -> np.ndarray:
    """Draw [N, 4] boxes (+labels/scores) on a BGR uint8 image copy."""
    out = np.ascontiguousarray(img.copy())
    for i, box in enumerate(np.asarray(boxes)):
        score = float(scores[i]) if scores is not None else None
        if score is not None and score < score_thr:
            continue
        cls = int(labels[i]) if labels is not None else 0
        color = _PALETTE[cls % len(_PALETTE)]
        x1, y1, x2, y2 = [int(round(v)) for v in box]
        cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
        text = ''
        if class_names is not None and labels is not None:
            text = str(class_names[cls])
        if score is not None:
            text = f'{text} {score:.2f}'.strip()
        if text:
            cv2.putText(out, text, (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1,
                        cv2.LINE_AA)
    return out


def sensor_image_to_heatmap(sensor_img: np.ndarray,
                            channel: int = 0) -> np.ndarray:
    """Render one sensor-image channel as a color heatmap (browser aid)."""
    ch = sensor_img[..., channel].astype(np.float32)
    mask = ch != 0
    if mask.any():
        lo, hi = np.percentile(ch[mask], [2, 98])
        ch = np.clip((ch - lo) / max(hi - lo, 1e-6), 0, 1)
    vis = (ch * 255).astype(np.uint8)
    return cv2.applyColorMap(vis, cv2.COLORMAP_TURBO)
