"""Evaluation API: batched sharded inference over a dataset + metrics.

Rebuild of `single_gpu_test` / `multi_gpu_test`
(`mmdet/apis/test.py:18-308`): iterate the test loader, run the jitted
predict, collect per-image detections host-side, then evaluate with the
dataset's metric (COCO mAP for nuScenes, KITTI AP with eval-on-crop for
STF). Cross-device result collection: single-host shards are plain
host transfers; on multi-host slices each process keeps its own rows
(`parallel.mesh.local_rows`) and the per-process result lists are
exchanged once at the end (`parallel.mesh.collect_results` — the
pickled-bytes all-gather of ref `mmdet/apis/test.py:278-308`).
"""

from __future__ import annotations

import functools
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from hrfuser_tpu.configs.presets import DataCfg, ExperimentCfg
from hrfuser_tpu.models.detectors.cascade_rcnn import predict


def run_inference(detector, variables, loader, progress: bool = True,
                  mesh=None) -> List[dict]:
    """Run the model over a loader; returns per-image dicts
    (boxes in original-image coordinates, scores, labels).

    With more than one visible device (or an explicit `mesh`) the
    batch axis is sharded over a data-parallel mesh — the reference's
    `multi_gpu_test` + result collection (`mmdet/apis/test.py:187-308`),
    with XLA sharding in place of DDP and plain host transfer in place
    of the tmpdir-pickle/all_gather machinery.
    """
    if mesh is None and len(jax.devices()) > 1:
        from hrfuser_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    to_global = None
    if mesh is not None and mesh.size > 1:
        from hrfuser_tpu.parallel.api import make_sharded_predict
        pred = make_sharded_predict(detector, mesh)
        pad_to = mesh.size
        if jax.process_count() > 1:
            # multi-host: each process's loader yields its own slice of
            # the global batch (the reference's DistributedSampler
            # contract); assemble global arrays before the jit call and
            # shrink the per-process pad target to the local device count
            from hrfuser_tpu.parallel.mesh import host_local_to_global
            to_global = functools.partial(host_local_to_global, mesh)
            pad_to = mesh.size // jax.process_count()
    else:
        pred = jax.jit(functools.partial(predict, detector))
        pad_to = 1
    results: List[dict] = []
    t0 = time.time()
    for bi, batch in enumerate(loader):
        img = batch['img']
        mod_imgs = batch.get('mod_imgs')
        img_shapes = batch['img_shapes']
        scale_factors = batch['scale_factors']
        num_real = int(batch.get('num_real', len(img)))
        if len(img) % pad_to:               # pad batch to the mesh size
            reps = [(0, pad_to - len(img) % pad_to)]
            pad = lambda x: np.concatenate(
                [x, np.repeat(np.asarray(x)[-1:], reps[0][1], axis=0)])
            img = pad(img)
            mod_imgs = [pad(m) for m in mod_imgs] if mod_imgs else mod_imgs
            img_shapes = pad(img_shapes)
            scale_factors = pad(scale_factors)
        if to_global is not None:
            img, mod_imgs, img_shapes, scale_factors = to_global(
                (img, mod_imgs, img_shapes, scale_factors))
        out = pred({'params': variables['params'],
                    'batch_stats': variables.get('batch_stats', {})},
                   img, mod_imgs, img_shapes, scale_factors)
        # multi-host-safe collection: `local_rows` pulls exactly this
        # process's rows (the rows its loader fed), which pair with the
        # process-local metas below; single-host it is a plain transfer
        from hrfuser_tpu.parallel.mesh import local_rows
        boxes, scores, labels, valid = map(
            local_rows, (out.boxes, out.scores, out.labels, out.valid))
        real = num_real
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
    if jax.process_count() > 1:
        # exchange per-process result lists so every host holds the
        # full set for metric evaluation (reference rank-0 gather,
        # mmdet/apis/test.py:235-308)
        from hrfuser_tpu.parallel.mesh import collect_results
        results = collect_results(results)
    return results


def evaluate_nuscenes(results: List[dict], dataset, num_classes: int,
                      class_ids=None) -> Dict[str, float]:
    from hrfuser_tpu.evaluation.coco_map import evaluate_coco_map
    preds, gts = [], []
    for i, det in enumerate(results):
        ann = dataset.get_ann_info(i)
        preds.append(dict(boxes=det['boxes'], scores=det['scores'],
                          labels=det['labels']))
        gts.append(dict(boxes=ann['bboxes'], labels=ann['labels']))
    return evaluate_coco_map(preds, gts, num_classes, class_ids=class_ids)


def evaluate_proposal_recall(results: List[dict], dataset,
                             proposal_nums=(100, 300, 1000)
                             ) -> Dict[str, float]:
    """AR@N of the detections treated as class-agnostic proposals
    (reference `metric='proposal_fast'`, `mmdet/datasets/coco.py:331-351`)."""
    from hrfuser_tpu.evaluation.recall import fast_eval_recall
    proposals = [np.concatenate(
        [r['boxes'], r['scores'][:, None]], axis=1) for r in results]
    return fast_eval_recall(dataset, proposals, proposal_nums)


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
    return evaluate_nuscenes(results, dataset, len(cfg.data.classes),
                             class_ids=cfg.data.evaluation_class_ids)
