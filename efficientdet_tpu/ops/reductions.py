"""Fused single-pass (max, argmax) class reduction via bit-packing.

The serving path reduces the per-level class logits (B, HWA, C) to the
per-anchor best (score, class). As two separate reductions (jnp.max +
jnp.argmax) XLA emits two passes over the tensor — at D0/P3 that is a
~750 MB bf16 array read twice. Packing the logit and the class index into
ONE int32 sort key turns it into a single integer-max pass:

    key = monotonic16(logit_bits) * 128 + (127 - class_idx)

- ``monotonic16`` is the classic IEEE trick: for non-negative floats the raw
  bit pattern is order-preserving, for negatives it is reversed — so map
  ``bits | 0x8000`` for positives and ``~bits`` for negatives. Integer
  comparison of the mapped 16-bit patterns then matches float comparison
  exactly (bf16 is a 16-bit IEEE float).
- ``127 - class_idx`` (C <= 128) makes ties resolve to the SMALLEST class
  index, matching ``jnp.argmax``'s first-index semantics. The only deviation
  is an exact -0.0 vs +0.0 logit tie (+0.0 wins here; argmax picks the first
  occurrence) — unreachable in practice for conv+bias outputs.
- the key uses 16 + 7 = 23 bits, so int32 max is exact.

The max bf16 logit is recovered bit-exactly by unmapping the high bits.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def packed_max_argmax_bf16(logits: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., C) bfloat16 -> (max (...,) bfloat16, argmax (...,) int32).

    Bit-exact max and first-index argmax (modulo the ±0.0 tie noted above)
    in a single reduction pass. C must be <= 128.
    """
    assert logits.dtype == jnp.bfloat16, logits.dtype
    c = logits.shape[-1]
    assert c <= 128, c
    bits = jax.lax.bitcast_convert_type(logits, jnp.uint16).astype(jnp.int32)
    negative = (bits & 0x8000) != 0
    mono = jnp.where(negative, (~bits) & 0xFFFF, bits | 0x8000)
    idx = jnp.arange(c, dtype=jnp.int32)
    key = mono * 128 + (127 - idx)
    best = jnp.max(key, axis=-1)
    best_mono = best >> 7
    best_cls = 127 - (best & 127)
    best_bits = jnp.where(best_mono >= 0x8000, best_mono - 0x8000,
                          (~best_mono) & 0xFFFF).astype(jnp.uint16)
    best_val = jax.lax.bitcast_convert_type(best_bits, jnp.bfloat16)
    return best_val, best_cls


def max_argmax(logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., C) -> (max, argmax int32); single-pass packed path for bf16,
    plain two-pass reductions otherwise (f32 keys would need 39 bits)."""
    if logits.dtype == jnp.bfloat16 and logits.shape[-1] <= 128:
        return packed_max_argmax_bf16(logits)
    return (jnp.max(logits, axis=-1),
            jnp.argmax(logits, axis=-1).astype(jnp.int32))
