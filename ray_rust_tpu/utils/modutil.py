"""Wrap-around modulo helpers (parity with reference src/modutil.rs:1-14).

The reference uses these for texture/pattern wrapping. All helpers follow the
exact float32 formulas of the Rust code, including its quirky detours through
f32 for the integer variants (src/modutil.rs:4-9), so that texture coordinates
wrap identically.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["fmod", "imod", "umod", "fimod", "rust_rem"]


def fmod(f, freq):
    """Floored f32 modulo: ``f - floor(f/freq)*freq`` (modutil.rs:1-3)."""
    f = jnp.asarray(f, jnp.float32)
    freq = jnp.asarray(freq, jnp.float32)
    return f - jnp.floor(f / freq) * freq


def imod(f, freq):
    """Integer modulo via f32 division: ``f - floor(f/freq as f32) as i32 * freq``
    (modutil.rs:4-6). Result is non-negative for positive ``freq``."""
    f = jnp.asarray(f, jnp.int32)
    freq = jnp.asarray(freq, jnp.int32)
    q = jnp.floor(f.astype(jnp.float32) / freq.astype(jnp.float32)).astype(jnp.int32)
    return f - q * freq


def umod(f, freq):
    """Unsigned modulo via f32 division (modutil.rs:7-9). Inputs assumed >= 0."""
    f = jnp.asarray(f, jnp.int32)
    freq = jnp.asarray(freq, jnp.int32)
    q = jnp.floor(f.astype(jnp.float32) / freq.astype(jnp.float32)).astype(jnp.int32)
    return f - q * freq


def fimod(f, freq):
    """Fractional/integer split of the floored modulo (modutil.rs:10-14).

    Returns ``(frac, idx)`` where ``frac = fmod(f,freq) - floor(fmod(f,freq))``
    and ``idx = imod(trunc(fmod(f,freq)), trunc(freq))`` — note the Rust ``as i32``
    casts truncate toward zero.
    """
    fm = fmod(f, freq)
    fi = jnp.floor(fm)
    idx = imod(fm.astype(jnp.int32), jnp.asarray(freq, jnp.float32).astype(jnp.int32))
    return fm - fi, idx


def rust_rem(a, b):
    """Rust's ``%`` on f32: exact truncated remainder (``fmodf``; sign follows
    the dividend). Used by the procedural sky (reference src/main.rs:234-235).
    Distinct from :func:`fmod`, which floors and double-rounds.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.fmod(a, b)
