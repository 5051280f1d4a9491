from hrfuser_tpu.ops.anchors import AnchorGenerator
from hrfuser_tpu.ops.boxes import (bbox2delta, bbox_area, bbox_flip,
                                   bbox_overlaps, clip_boxes, delta2bbox,
                                   scale_boxes)
from hrfuser_tpu.ops.nms import batched_nms, multiclass_nms, nms
from hrfuser_tpu.ops.roi_align import (map_roi_levels, multilevel_roi_align,
                                       multilevel_roi_align_onehot,
                                       roi_align)
from hrfuser_tpu.ops.window import (relative_position_index, window_pad_mask,
                                    window_partition, window_reverse)

__all__ = [
    'AnchorGenerator', 'bbox2delta', 'bbox_area', 'bbox_flip',
    'bbox_overlaps', 'clip_boxes', 'delta2bbox', 'scale_boxes',
    'batched_nms', 'multiclass_nms', 'nms', 'map_roi_levels',
    'multilevel_roi_align', 'multilevel_roi_align_onehot', 'roi_align', 'relative_position_index',
    'window_pad_mask', 'window_partition', 'window_reverse',
]
