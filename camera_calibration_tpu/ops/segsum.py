"""Segment reductions as chunked one-hot MXU contractions.

TPU scatter-adds serialize per row (measured ~120 ms for a 262k-row
scatter of 6×6 blocks on a v5e); the same reduction expressed as
``one_hotᵀ @ values`` runs on the MXU in ~1 ms.  The one-hot indicator is
built on the fly in fixed-size chunks so peak memory stays bounded
(chunk × num_segments floats).

This is the TPU-native analog of the reference CUDA BA's atomic-add
accumulation modes (reference: bundle_adjustment/cuda_joint_optimization.
cu:418-451) — conflict-free by construction instead of by atomics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Above this many segments the dense indicator contraction costs more than
# a scatter; fall back to jax.ops.segment_sum.
MAX_ONEHOT_SEGMENTS = 8192
_CHUNK = 32768


def onehot_segment_sum(values, segment_ids, num_segments, chunk=_CHUNK):
    """segment_sum(values, segment_ids) via chunked one-hot matmuls.

    values: (n, ...) — trailing dims are flattened for the contraction;
    segment_ids: (n,) int32.  Exact for float inputs (indicator entries
    are 0/1; accumulation in the requested dtype).
    """
    if num_segments > MAX_ONEHOT_SEGMENTS:
        return jax.ops.segment_sum(
            values, segment_ids, num_segments=num_segments
        )
    n = values.shape[0]
    trail = values.shape[1:]
    flat = values.reshape(n, -1)
    c = flat.shape[1]
    chunk = min(chunk, n)
    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
        segment_ids = jnp.concatenate(
            [segment_ids, jnp.zeros((pad,), segment_ids.dtype)]
        )
        # padded rows must contribute nothing
        flat = flat.at[n:].set(0.0)
    iota = jnp.arange(num_segments, dtype=segment_ids.dtype)

    def body(i, acc):
        v = jax.lax.dynamic_slice_in_dim(flat, i * chunk, chunk)
        ix = jax.lax.dynamic_slice_in_dim(segment_ids, i * chunk, chunk)
        oh = (ix[:, None] == iota[None, :]).astype(flat.dtype)
        return acc + jnp.einsum(
            "nm,nc->mc", oh, v,
            preferred_element_type=flat.dtype,
        )

    out = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((num_segments, c), flat.dtype)
    )
    return out.reshape((num_segments,) + trail)
