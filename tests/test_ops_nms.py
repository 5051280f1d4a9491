"""Static-shape NMS vs a naive sequential greedy reference."""

import numpy as np
import jax.numpy as jnp

from hrfuser_tpu.ops import batched_nms, multiclass_nms, nms
from hrfuser_tpu.ops.nms import NEG_INF


def _np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def _greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind='stable')
    keep = []
    sup = np.zeros(len(boxes), bool)
    for i in order:
        if sup[i] or scores[i] <= NEG_INF / 2:
            continue
        keep.append(i)
        iou = _np_iou(boxes[i:i + 1], boxes)[0]
        sup |= iou > thr
        sup[i] = False
    return keep


def _rand(n, seed, clusters=8):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(50, 550, (clusters, 2))
    which = rng.integers(0, clusters, n)
    cxy = centers[which] + rng.normal(0, 10, (n, 2))
    wh = rng.uniform(20, 80, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    return boxes, scores


def test_nms_matches_greedy():
    for seed in range(4):
        boxes, scores = _rand(200, seed)
        ref = _greedy_nms(boxes, scores, 0.5)
        got_boxes, got_scores, valid = nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=100,
            block_size=64)
        nvalid = int(np.asarray(valid).sum())
        assert nvalid == min(len(ref), 100)
        np.testing.assert_allclose(np.asarray(got_boxes)[:nvalid],
                                   boxes[ref[:nvalid]], atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_scores)[:nvalid],
                                   scores[ref[:nvalid]], atol=1e-6)


def test_nms_with_padding_rows():
    boxes, scores = _rand(150, 9)
    pad_boxes = np.concatenate([boxes, np.zeros((50, 4), np.float32)])
    pad_scores = np.concatenate([scores, np.full(50, NEG_INF, np.float32)])
    ref = _greedy_nms(boxes, scores, 0.6)
    _, got_scores, valid = nms(jnp.asarray(pad_boxes),
                               jnp.asarray(pad_scores), 0.6, max_out=200,
                               block_size=64)
    assert int(np.asarray(valid).sum()) == len(ref)


def test_nms_fewer_boxes_than_max_out():
    boxes, scores = _rand(10, 3)
    got_boxes, got_scores, valid = nms(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5, max_out=100)
    ref = _greedy_nms(boxes, scores, 0.5)
    assert int(np.asarray(valid).sum()) == len(ref)


def test_batched_nms_separates_classes():
    # identical boxes in different classes must both survive
    boxes = np.tile(np.array([[10., 10., 50., 50.]], np.float32), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    _, _, out_idxs, valid = batched_nms(jnp.asarray(boxes),
                                        jnp.asarray(scores),
                                        jnp.asarray(idxs), 0.5, max_out=10)
    assert int(np.asarray(valid).sum()) == 2


def test_batched_nms_matches_per_class_greedy():
    boxes, scores = _rand(120, 11)
    idxs = (np.arange(120) % 3).astype(np.int32)
    ref_keep = []
    for c in range(3):
        m = np.where(idxs == c)[0]
        ref_keep += [m[i] for i in _greedy_nms(boxes[m], scores[m], 0.5)]
    ref_keep.sort(key=lambda i: -scores[i])
    got_boxes, got_scores, _, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(idxs), 0.5,
        max_out=120, block_size=32)
    n = int(np.asarray(valid).sum())
    assert n == len(ref_keep)
    np.testing.assert_allclose(np.asarray(got_scores)[:n],
                               scores[ref_keep], atol=1e-6)


def test_multiclass_nms_shapes_and_threshold():
    rng = np.random.default_rng(0)
    n, c = 50, 10
    boxes = _rand(n, 5)[0]
    logits = rng.normal(0, 1, (n, c + 1)).astype(np.float32)
    scores = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    out_boxes, out_scores, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.05,
        iou_threshold=0.5, max_per_img=100, pre_nms_cap=200, block_size=32)
    assert out_boxes.shape == (100, 4)
    assert out_scores.shape == (100,)
    v = np.asarray(valid)
    s = np.asarray(out_scores)
    lbl = np.asarray(labels)
    assert (s[v] > 0.05).all()
    assert ((lbl[v] >= 0) & (lbl[v] < c)).all()
    assert (lbl[~v] == -1).all()


def test_nms_early_exit_parity():
    """Early block-loop exit (kept >= max_out) must not change results:
    spread-out boxes keep nearly every candidate, so max_out fills in
    the first block while later blocks still hold valid candidates."""
    rng = np.random.default_rng(7)
    n = 512
    cxy = rng.uniform(50, 5000, (n, 2))            # mostly non-overlapping
    wh = rng.uniform(10, 30, (n, 2))
    boxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref = _greedy_nms(boxes, scores, 0.5)
    for max_out in (16, 100):
        got_boxes, got_scores, valid = nms(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=max_out,
            block_size=64)
        nvalid = int(np.asarray(valid).sum())
        assert nvalid == min(len(ref), max_out)
        np.testing.assert_allclose(np.asarray(got_boxes)[:nvalid],
                                   boxes[ref[:nvalid]], atol=1e-4)
