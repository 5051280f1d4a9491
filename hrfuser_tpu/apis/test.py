"""Evaluation API: batched sharded inference over a dataset + metrics.

Rebuild of `single_gpu_test` / `multi_gpu_test`
(`mmdet/apis/test.py:18-308`): iterate the test loader, run the jitted
predict, collect per-image detections host-side, then evaluate with the
dataset's metric (COCO mAP for nuScenes, KITTI AP with eval-on-crop for
STF). Cross-device result collection is just host transfer of the
batch-sharded outputs — no tmpdir-pickle/all_gather machinery needed.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from hrfuser_tpu.configs.presets import DataCfg, ExperimentCfg
from hrfuser_tpu.models.detectors.cascade_rcnn import predict


def run_inference(detector, variables, loader, progress: bool = True
                  ) -> List[dict]:
    """Run the model over a loader; returns per-image dicts
    (boxes in original-image coordinates, scores, labels)."""
    pred = jax.jit(functools.partial(predict, detector))
    results: List[dict] = []
    t0 = time.time()
    for bi, batch in enumerate(loader):
        out = pred({'params': variables['params'],
                    'batch_stats': variables.get('batch_stats', {})},
                   batch['img'], batch.get('mod_imgs'),
                   batch['img_shapes'], batch['scale_factors'])
        boxes = np.asarray(out.boxes)
        scores = np.asarray(out.scores)
        labels = np.asarray(out.labels)
        valid = np.asarray(out.valid)
        real = int(batch.get('num_real', len(boxes)))
        for i in range(real):
            v = valid[i]
            results.append(dict(boxes=boxes[i][v], scores=scores[i][v],
                                labels=labels[i][v],
                                meta=batch['metas'][i]))
        if progress and bi % 20 == 0:
            done = len(results)
            rate = done / max(time.time() - t0, 1e-6)
            print(f'\r[test] {done} imgs ({rate:.1f} img/s)', end='')
    if progress:
        print()
    return results


def evaluate_nuscenes(results: List[dict], dataset,
                      num_classes: int) -> Dict[str, float]:
    from hrfuser_tpu.evaluation.coco_map import evaluate_coco_map
    preds, gts = [], []
    for i, det in enumerate(results):
        ann = dataset.get_ann_info(i)
        preds.append(dict(boxes=det['boxes'], scores=det['scores'],
                          labels=det['labels']))
        gts.append(dict(boxes=ann['bboxes'], labels=ann['labels']))
    return evaluate_coco_map(preds, gts, num_classes)


def evaluate_stf(results: List[dict], dataset, classes,
                 eval_on_crop=None) -> Dict[str, float]:
    from hrfuser_tpu.evaluation.kitti_eval import kitti_eval_2d
    dt_annos = dataset.detections_to_kitti(
        [r['boxes'] for r in results], [r['scores'] for r in results],
        [r['labels'] for r in results],
        [np.ones(len(r['boxes']), bool) for r in results])
    gt_annos = dataset.gt_annos(crop=eval_on_crop)
    return kitti_eval_2d(gt_annos, dt_annos, list(classes))


def evaluate(cfg: ExperimentCfg, results: List[dict], dataset
             ) -> Dict[str, float]:
    if cfg.data.dataset == 'stf':
        return evaluate_stf(results, dataset, cfg.data.classes,
                            cfg.data.eval_on_crop)
    return evaluate_nuscenes(results, dataset, len(cfg.data.classes))
