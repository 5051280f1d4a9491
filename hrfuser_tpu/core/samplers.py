"""Random pos/neg sampler with fixed quotas, in-jit.

Rebuild of `RandomSampler` (`mmdet/core/bbox/samplers/random_sampler.py`):
sample up to `num * pos_fraction` positives uniformly at random, fill the
rest of the `num` quota with random negatives. Implemented with random
ranking (a uniform key per candidate + masked top-k), which draws the same
uniform-without-replacement distribution as the reference's `randperm`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class SampleResult(NamedTuple):
    pos_mask: Array       # [N] bool, sampled positives
    neg_mask: Array       # [N] bool, sampled negatives
    num_pos: Array        # scalar int32
    num_neg: Array        # scalar int32


def random_sample(rng: Array, pos_cand: Array, neg_cand: Array,
                  num: int, pos_fraction: float) -> SampleResult:
    """Select sampled pos/neg masks from candidate masks.

    Args:
        pos_cand/neg_cand: [N] bool candidate masks (mutually exclusive).
        num: total quota (e.g. 256 RPN / 512 RCNN).
        pos_fraction: positive share of the quota.
    """
    n = pos_cand.shape[0]
    rng_p, rng_n = jax.random.split(rng)
    pos_quota = int(num * pos_fraction)

    # random rank among positives
    pos_keys = jnp.where(pos_cand, jax.random.uniform(rng_p, (n,)), jnp.inf)
    pos_rank = jnp.argsort(jnp.argsort(pos_keys))
    n_pos_cand = jnp.sum(pos_cand)
    n_pos = jnp.minimum(n_pos_cand, pos_quota)
    pos_sel = pos_cand & (pos_rank < n_pos)

    neg_keys = jnp.where(neg_cand, jax.random.uniform(rng_n, (n,)), jnp.inf)
    neg_rank = jnp.argsort(jnp.argsort(neg_keys))
    n_neg_cand = jnp.sum(neg_cand)
    n_neg = jnp.minimum(n_neg_cand, num - n_pos)
    neg_sel = neg_cand & (neg_rank < n_neg)

    return SampleResult(pos_sel, neg_sel, n_pos.astype(jnp.int32),
                        n_neg.astype(jnp.int32))


def select_fixed(sample: SampleResult, num: int) -> tuple:
    """Compress sampled masks into `num` fixed indices (pos first).

    Returns (indices [num] int32, is_pos [num] bool, valid [num] bool).
    Unfilled slots point at index 0 with valid=False.
    """
    n = sample.pos_mask.shape[0]
    # order: positives (rank 0..), then negatives, then everything else
    key = jnp.where(sample.pos_mask, 0, jnp.where(sample.neg_mask, 1, 2))
    order = jnp.argsort(key, stable=True)
    if n < num:                      # fewer candidates than the quota
        order = jnp.pad(order, (0, num - n))
        pad_valid = jnp.arange(num) < n
    else:
        pad_valid = jnp.ones((num,), bool)
    idx = order[:num]
    sel = (sample.pos_mask | sample.neg_mask)[idx] & pad_valid
    is_pos = sample.pos_mask[idx] & sel
    idx = jnp.where(sel, idx, 0)
    return idx.astype(jnp.int32), is_pos, sel
