"""Anchor generation with static shapes.

TPU-native rebuild of the reference `AnchorGenerator`
(`mmdet/core/anchor/anchor_generator.py:13-468`). Anchors are generated
host-side with numpy at trace time (they are static for fixed feature-map
shapes) and become constants inside the jitted graph.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


class AnchorGenerator:
    """Multi-level grid anchors.

    Matches `gen_single_level_base_anchors` / `grid_priors`
    (`anchor_generator.py:131-195,318-390`): for each level, base anchors of
    size `stride * scale` with aspect `ratios`, centered at
    `center_offset * stride`, tiled over the feature grid row-major
    (x fastest), anchor index fastest within a cell.
    """

    def __init__(self,
                 strides: Sequence[int],
                 ratios: Sequence[float] = (0.5, 1.0, 2.0),
                 scales: Sequence[float] = (8,),
                 base_sizes: Sequence[int] = None,
                 center_offset: float = 0.0):
        self.strides = [(s, s) if isinstance(s, int) else tuple(s)
                        for s in strides]
        self.ratios = np.asarray(ratios, np.float32)
        self.scales = np.asarray(scales, np.float32)
        self.base_sizes = ([min(s) for s in self.strides]
                          if base_sizes is None else list(base_sizes))
        self.center_offset = center_offset
        self.base_anchors = [
            self._single_level_base_anchors(bs) for bs in self.base_sizes
        ]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def _single_level_base_anchors(self, base_size: float) -> np.ndarray:
        w = h = float(base_size)
        x_center = self.center_offset * w
        y_center = self.center_offset * h
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        # scale-major ordering: ratio index varies slowest
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        return np.stack([
            x_center - 0.5 * ws, y_center - 0.5 * hs,
            x_center + 0.5 * ws, y_center + 0.5 * hs,
        ], axis=-1).astype(np.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]
                     ) -> List[np.ndarray]:
        """Anchors for each level; featmap_sizes is [(H, W), ...]."""
        assert len(featmap_sizes) == self.num_levels
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            sw, sh = self.strides[lvl]
            shift_x = np.arange(fw, dtype=np.float32) * sw
            shift_y = np.arange(fh, dtype=np.float32) * sh
            xx, yy = np.meshgrid(shift_x, shift_y)   # [fh, fw] each
            shifts = np.stack([xx, yy, xx, yy], axis=-1).reshape(-1, 4)
            anchors = (shifts[:, None, :] + self.base_anchors[lvl][None, :, :])
            out.append(anchors.reshape(-1, 4))
        return out

    def valid_flags(self, featmap_sizes: Sequence[Tuple[int, int]],
                    pad_shape: Tuple[int, int]) -> List[np.ndarray]:
        """Per-anchor validity: grid cell inside ceil(pad_shape / stride).

        Matches `single_level_valid_flags` (`anchor_generator.py:392-450`).
        """
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            sw, sh = self.strides[lvl]
            vw = min(int(np.ceil(pad_shape[1] / sw)), fw)
            vh = min(int(np.ceil(pad_shape[0] / sh)), fh)
            vx = np.zeros(fw, dtype=bool)
            vy = np.zeros(fh, dtype=bool)
            vx[:vw] = True
            vy[:vh] = True
            valid = (vy[:, None] & vx[None, :]).reshape(-1)
            valid = np.repeat(valid, self.num_base_anchors[lvl])
            out.append(valid)
        return out
