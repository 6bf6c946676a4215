"""Fused Pallas GRU scan with a custom VJP (SURVEY.md §7 hard-part 2).

The encoder's recurrence is the one sequential computation in the framework.
The ``lax.scan`` formulation dispatches one [B,H]×[H,3H] matmul per step with
the hidden state and weights round-tripping through XLA's buffers; this
kernel instead runs the ENTIRE scan inside one ``pallas_call``:

  - ``w_h``/``b_h`` live in VMEM for the whole sequence (no per-step reload),
  - the hidden state is a VMEM scratch carried across grid steps (the TPU
    grid is a sequential loop, so scratch persists),
  - the input projections ``xw`` (precomputed as one big batched matmul
    outside, same trick as the scan path) stream in one time-block per step.

The backward pass is a second kernel scanning in reverse, recomputing the
cheap gate activations from (xw, h_{t-1}) instead of storing them — the only
saved tensor is the forward output ``ys`` itself.

Padding contract (wrapper-enforced): B → multiple of 8, H → multiple of 128.
Padded hidden lanes can hold garbage but cannot leak: their ``w_h`` rows and
columns are zero, and padded batch rows carry mask=0 so their state stays 0.

Numerical equivalence with the scan path (forward AND gradients) is enforced
by tests/test_gru_kernel.py on the CPU interpreter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gates(xw_t, hw, h_prev):
    xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
    hr, hz, hn = jnp.split(hw, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h_prev
    return r, z, n, hn, h_new


def _fwd_kernel(xw_ref, wh_ref, bh_ref, mask_ref, h0_ref, ys_ref, h_scr):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_scr[:] = h0_ref[:]

    h_prev = h_scr[:]
    hw = (
        jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        + bh_ref[:]
    )
    _, _, _, _, h_new = _gates(xw_ref[0], hw, h_prev)
    m = mask_ref[0]  # [B, 1]
    h = jnp.where(m > 0, h_new, h_prev)
    h_scr[:] = h
    ys_ref[0] = h


def _bwd_kernel(
    xw_ref, wh_ref, bh_ref, mask_ref, h0_ref, ys_ref, ys_prev_ref, dys_ref,
    dxw_ref, dh0_ref, dwh_ref, dbh_ref, dh_scr,
):
    """One reverse step: grid index i counts backward via index maps."""
    i = pl.program_id(0)  # 0 .. T-1, processing t = T-1-i (via index_map)
    nt = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dwh_ref[:] = jnp.zeros_like(dwh_ref)
        dbh_ref[:] = jnp.zeros_like(dbh_ref)

    # h_{t-1}: previous output, or h0 at the first forward step (i == nt-1).
    h_prev = jnp.where(i == nt - 1, h0_ref[:], ys_prev_ref[0])
    hw = (
        jnp.dot(h_prev, wh_ref[:], preferred_element_type=jnp.float32)
        + bh_ref[:]
    )
    r, z, n, hn, _ = _gates(xw_ref[0], hw, h_prev)

    dh_total = dys_ref[0] + dh_scr[:]
    m = mask_ref[0]  # [B, 1]
    dh_upd = jnp.where(m > 0, dh_total, 0.0)  # grad into the GRU update
    dh_skip = jnp.where(m > 0, 0.0, dh_total)  # masked steps: pass-through

    dn = dh_upd * (1.0 - z)
    dz = dh_upd * (h_prev - n)
    dn_pre = dn * (1.0 - n * n)
    dxn = dn_pre
    dhn = dn_pre * r
    dr = dn_pre * hn
    dz_pre = dz * z * (1.0 - z)
    dr_pre = dr * r * (1.0 - r)

    dhg = jnp.concatenate([dr_pre, dz_pre, dhn], axis=-1)  # [B, 3H]
    dxw_ref[0] = jnp.concatenate([dr_pre, dz_pre, dxn], axis=-1)

    dh_prev = (
        dh_upd * z
        + dh_skip
        + jnp.dot(dhg, wh_ref[:].T, preferred_element_type=jnp.float32)
    )
    dwh_ref[:] += jnp.dot(
        h_prev.T, dhg, preferred_element_type=jnp.float32
    )
    dbh_ref[:] += jnp.sum(dhg, axis=0, keepdims=True)
    dh_scr[:] = dh_prev

    @pl.when(i == nt - 1)
    def _():
        dh0_ref[:] = dh_prev


def _pad_args(xw, w_h, b_h, mask, h0):
    t, b, h3 = xw.shape
    h = h3 // 3
    bp = _round_up(b, 8)
    hp = _round_up(h, 128)
    if (bp, hp) == (b, h):
        return xw, w_h, b_h, mask[..., None], h0, b, h
    xw_p = jnp.zeros((t, bp, 3 * hp), xw.dtype)
    for g in range(3):
        xw_p = xw_p.at[:, :b, g * hp : g * hp + h].set(
            xw[:, :, g * h : (g + 1) * h]
        )
    wh_p = jnp.zeros((hp, 3 * hp), w_h.dtype)
    for g in range(3):
        wh_p = wh_p.at[:h, g * hp : g * hp + h].set(
            w_h[:, g * h : (g + 1) * h]
        )
    bh_p = jnp.zeros((3 * hp,), b_h.dtype)
    for g in range(3):
        bh_p = bh_p.at[g * hp : g * hp + h].set(b_h[g * h : (g + 1) * h])
    mask_p = jnp.zeros((t, bp, 1), mask.dtype).at[:, :b, 0].set(mask)
    h0_p = jnp.zeros((bp, hp), h0.dtype).at[:b, :h].set(h0)
    return xw_p, wh_p, bh_p, mask_p, h0_p, b, h


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(xw, w_h, b_h, mask, h0):
    t, b, h3 = xw.shape
    h = h3 // 3
    grid = (t,)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((t, b, h), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, b, h3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, b, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=_interpret(),
    )(xw, w_h, b_h.reshape(1, h3), mask, h0)


def _bwd_call(xw, w_h, b_h, mask, h0, ys, dys):
    t, b, h3 = xw.shape
    h = h3 // 3
    rev = lambda i: (t - 1 - i, 0, 0)  # noqa: E731
    full = lambda i: (0, 0)  # noqa: E731
    # ys_prev[t] = ys[t-1]; prepend a zero row (replaced by h0 in-kernel).
    ys_prev = jnp.concatenate([jnp.zeros_like(ys[:1]), ys[:-1]], axis=0)
    dxw, dh0, dwh, dbh = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((t, b, h3), jnp.float32),
            jax.ShapeDtypeStruct((b, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h3), jnp.float32),
            jax.ShapeDtypeStruct((1, h3), jnp.float32),
        ),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, h3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, h), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, b, h3), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, h), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h3), full, memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((b, h), jnp.float32)],
        interpret=_interpret(),
    )(xw, w_h, b_h.reshape(1, h3), mask, h0, ys, ys_prev, dys)
    return dxw, dh0, dwh, dbh.reshape(h3)


@jax.custom_vjp
def fused_gru(xw, w_h, b_h, mask, h0):
    """Fused GRU scan.

    xw   [T, B, 3H] — precomputed input projections (r, z, n gate order)
    w_h  [H, 3H]    — recurrent kernel
    b_h  [3H]       — recurrent bias
    mask [T, B]     — 1 for valid steps (state freezes through 0s)
    h0   [B, H]     — initial hidden state
    → ys [T, B, H]
    """
    ys, _ = _fused_gru_fwd(xw, w_h, b_h, mask, h0)
    return ys


def _fused_gru_fwd(xw, w_h, b_h, mask, h0):
    xw = xw.astype(jnp.float32)
    mask_f = mask.astype(jnp.float32)
    xw_p, wh_p, bh_p, mask_p, h0_p, b, h = _pad_args(
        xw, w_h.astype(jnp.float32), b_h.astype(jnp.float32), mask_f,
        h0.astype(jnp.float32),
    )
    ys_p = _fwd_call(xw_p, wh_p, bh_p, mask_p, h0_p)
    ys = ys_p[:, :b, :h]
    return ys, (xw, w_h, b_h, mask_f, h0, ys)


def _fused_gru_bwd(res, dys):
    xw, w_h, b_h, mask_f, h0, ys = res
    xw_p, wh_p, bh_p, mask_p, h0_p, b, h = _pad_args(
        xw, w_h.astype(jnp.float32), b_h.astype(jnp.float32), mask_f,
        h0.astype(jnp.float32),
    )
    t = xw.shape[0]
    hp = wh_p.shape[0]
    ys_p = jnp.zeros((t, xw_p.shape[1], hp), jnp.float32).at[:, :b, :h].set(ys)
    dys_p = jnp.zeros_like(ys_p).at[:, :b, :h].set(
        dys.astype(jnp.float32)
    )
    dxw_p, dh0_p, dwh_p, dbh_p = _bwd_call(
        xw_p, wh_p, bh_p, mask_p, h0_p, ys_p, dys_p
    )
    # un-pad, regrouping the 3 gate blocks
    def ungroup(a_p, last_real, last_pad):
        return jnp.concatenate(
            [
                a_p[..., g * last_pad : g * last_pad + last_real]
                for g in range(3)
            ],
            axis=-1,
        )

    dxw = ungroup(dxw_p[:, :b, :], h, hp)
    dwh = ungroup(dwh_p[:h, :], h, hp)
    dbh = ungroup(dbh_p[None, :], h, hp)[0]
    dh0 = dh0_p[:b, :h]
    return dxw, dwh, dbh, jnp.zeros_like(mask_f), dh0


fused_gru.defvjp(
    lambda xw, w_h, b_h, mask, h0: _fused_gru_fwd(xw, w_h, b_h, mask, h0),
    _fused_gru_bwd,
)


def gru_scan_reference(xw, w_h, b_h, mask, h0):
    """lax.scan reference with identical semantics (test oracle)."""

    def step(hprev, inp):
        xw_t, m_t = inp
        hw = hprev @ w_h + b_h
        _, _, _, _, h_new = _gates(xw_t, hw, hprev)
        hcur = jnp.where(m_t[:, None] > 0, h_new, hprev)
        return hcur, hcur

    _, ys = jax.lax.scan(step, h0, (xw, mask.astype(jnp.float32)))
    return ys
