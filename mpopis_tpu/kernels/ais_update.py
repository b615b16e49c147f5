"""Fused AIS distribution-update kernels.

Two rounds of measurement (BENCH.md round 2) established that at the
flagship config (K=8192, cs=100) the AIS *distribution update* — not the
rollout — dominates the policy step: 0.550 ms per CEMPPI iteration and
0.644 per CMA iteration, almost all of it cross-op LATENCY of small-matrix
linalg (XLA cholesky(100x100) ~0.35 ms of blocked dynamic-slice steps,
eigh ~0.74 ms) plus the serialized elementwise/scalar chain around it.
Swapping single ops for Pallas equivalents did not help: a lone custom
call inside the compiled AIS scan acts as a fusion/layout barrier
(kernels/linalg.py is opt-in for exactly that reason).

The fix is to fuse each strategy's whole moment-refit -> shrinkage ->
jitter -> Cholesky chain into ONE Pallas program, so the policy step pays
one kernel boundary per AIS iteration instead of ~10 latency-bound XLA
ops. What stays in XLA is only what fuses well there already: the cost
sort/elite-mask (one fusion), the (cs,K) sampling matmul, and the scan
carry plumbing.

Reference semantics covered (same math as the jnp path, pinned by
tests/test_kernels.py in interpret mode):
- `masked_refit_chol`: the CEMPPI elite refit, i.e.
  shrinkage_cov_masked(E, mask, m, method) + _jittered + cholesky_lower
  for all five estimators (:mle,:lw,:ss,:rblw,:oas —
  mppi_mpopi_policies.jl:407-426,:464). The K axis is processed in
  VMEM-sized chunks; the lw/ss fourth-moment matrices are accumulated in
  the standardization-free form (xs Xs^T = D^-1 (Xc Xc^T) D^-1 etc.), so
  each chunk contributes two (cs,cs) MXU matmuls and no (cs,K)
  temporaries survive the chunk.
- `weighted_refit_chol`: the probability-weighted moment refit used by
  muSigma-AIS and PMC (StatsBase.mean_and_cov(E, w, 2) semantics,
  mppi_mpopi_policies.jl:732,:807) + jitter + Cholesky. PMC passes
  w = counts/K and corrected=True (the /(K-1) form via a K/(K-1) factor).
- `cma_update_chol`: the CMA tail after the (K,)-sized rank bookkeeping —
  Sigma^{-1/2} by coupled Newton-Schulz (matmul-only; the fused path's
  replacement for eigh, cf. cfg.cma_fast_sqrt), the evolution-path and
  step-size chain, the quirk-form rank-mu Sigma update, symmetrization,
  jitter and Cholesky (mppi_mpopi_policies.jl:578-606).

Enablement: `fused_update_enabled(dtype)` — RETIRED to opt-in experiment
status after two rounds of negative results (see its docstring):
MPOPIS_FUSED_UPDATE=1 enables the kernels in f32 (non-TPU backends run
the Pallas interpreter); anything else keeps the pure-jnp path, which
measured faster at every shape tested (BENCH.md round-4 table).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_update_enabled(dtype) -> bool:
    """Opt-in (MPOPIS_FUSED_UPDATE=1). Round-3 same-process A/B on the
    real chip (scripts/ab_fused_update.py): the fused kernels are NOT
    faster end-to-end — cemppi 0.556 vs 0.522 ms/AIS-iteration, cmamppi
    0.768 vs 0.648 — because the per-iteration cost is dominated by the
    roofline-bound rollout (~0.49 ms of the 0.52), not the refit chain
    XLA already overlaps well. Round 4 probed the hypothesized
    large-cs/small-K crossover and it does not exist — the loss GROWS
    with cs (x0.55 end-to-end at K=512/H=200/cs=400, x0.51 at
    K=128/H=256/cs=512; BENCH.md round-4) — so these kernels are
    RETIRED to experiment status: validated vs the XLA composition on
    TPU and under the interpreter, kept as regression coverage for
    Pallas small-linalg patterns, never the default."""
    env = os.environ.get("MPOPIS_FUSED_UPDATE", "").strip()
    if env == "1":  # force on (non-TPU backends run the interpreter)
        return jnp.dtype(dtype) == jnp.float32
    return False


def default_interpret() -> bool:
    """Kernels self-interpret off-TPU (MPOPIS_FUSED_UPDATE=1 on CPU runs
    the fused path through the Pallas interpreter for testing)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Shared in-kernel pieces
# ---------------------------------------------------------------------------

def _chol_inplace(a, n: int):
    """Lower Cholesky of (n,n) `a` via right-looking outer-product steps —
    the kernels/linalg.py single-program form (masked column extraction,
    no dynamic slicing)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(j, carry):
        a, l = carry
        piv = jnp.sum(jnp.where((rows == j) & (cols == j), a, 0.0))
        inv = 1.0 / jnp.sqrt(piv)
        colj = jnp.sum(jnp.where(cols == j, a, 0.0), axis=1, keepdims=True)
        colm = jnp.where(rows[:, :1] >= j, colj * inv, 0.0)
        l = jnp.where(cols == j, colm, l)
        a = a - colm * colm.reshape(1, n)
        return a, l

    _, l = jax.lax.fori_loop(0, n, body, (a, jnp.zeros_like(a)))
    return l


def _eye_mask(n: int, dtype):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (rows == cols).astype(dtype)


def _jitter_mat(sigma, n: int, jitter: float):
    """models _jittered (strategies.py): dtype-scaled diagonal floor."""
    eye = _eye_mask(n, sigma.dtype)
    scale = jnp.sum(sigma * eye) / n
    eps_floor = 100.0 * jnp.finfo(sigma.dtype).eps * scale
    return sigma + (jitter + eps_floor) * eye


def _shrink_finalize(a, b, n: int, m: int, method: str, dtype):
    """Shrinkage estimate from the accumulated moments.

    a = Xc_masked Xc_masked^T (n,n);  b = (Xc^2)(Xc^2)^T (n,n) or None.
    Matches ops/covariance.py's masked estimators with n_samples=m.
    """
    eye = _eye_mask(n, dtype)
    tiny = jnp.finfo(dtype).tiny
    s = a / m
    if method == "mle":
        return s
    if method == "lw":
        prod_sq = b / m
        var_s = (prod_sq - s * s) / m
        num = jnp.sum(var_s) - jnp.sum(var_s * eye)
        den = jnp.sum(s * s) - jnp.sum((s * eye) ** 2)
        lam = jnp.clip(num / jnp.maximum(den, tiny), 0.0, 1.0)
        # diag(S) as a matrix is just s * eye — stays 2D (Mosaic relayout
        # of (n,) intermediates broke the rblw lowering; see below)
        return (1.0 - lam) * s + lam * (s * eye)
    if method == "ss":
        # Standardization commutes with the sample-sum matmuls:
        # Xs Xs^T = D^-1 A D^-1 and (Xs^2)(Xs^2)^T = D^-2 B D^-2 with
        # D = diag(sd), so no (n,K) standardized temporary is needed.
        v = jnp.sum(a * eye, axis=1) / (m - 1)  # unbiased variances
        sd = jnp.sqrt(jnp.maximum(v, tiny))
        inv_sd = 1.0 / sd
        wbar = (a / m) * inv_sd[:, None] * inv_sd[None, :]
        r = (m / (m - 1)) * wbar
        inv_v = inv_sd * inv_sd
        sum_w2 = b * inv_v[:, None] * inv_v[None, :]
        var_r = (m / (m - 1) ** 3) * (sum_w2 - m * wbar * wbar)
        num = jnp.sum(var_r) - jnp.sum(var_r * eye)
        den = jnp.sum(r * r) - jnp.sum((r * eye) ** 2)
        lam = jnp.clip(num / jnp.maximum(den, tiny), 0.0, 1.0)
        r_shrunk = (1.0 - lam) * r
        r_shrunk = r_shrunk * (1.0 - eye) + eye
        v_mle = jnp.sum(a * eye, axis=1) / m
        sd_mle = jnp.sqrt(jnp.maximum(v_mle, tiny))
        return r_shrunk * sd_mle[:, None] * sd_mle[None, :]
    # rblw / oas: diagonal-common-variance target tr(S)/p * I. All
    # reductions stay (n,n)-2D: reducing an (n,) intermediate to a scalar
    # hit a Mosaic relayout error ("Non-singleton logical dimension is
    # replicated in destination but not in source") on the real TPU.
    p = n
    tr_s = jnp.sum(s * eye)
    tr_s2 = jnp.sum(s * s)
    if method == "rblw":
        num = ((m - 2.0) / m) * tr_s2 + tr_s**2
        den = (m + 2.0) * (tr_s2 - tr_s**2 / p)
    elif method == "oas":
        num = (1.0 - 2.0 / p) * tr_s2 + tr_s**2
        den = (m + 1.0 - 2.0 / p) * (tr_s2 - tr_s**2 / p)
    else:
        raise ValueError(f"unknown sigma_est {method!r}")
    rho = jnp.clip(num / jnp.maximum(den, tiny), 0.0, 1.0)
    return (1.0 - rho) * s + rho * ((tr_s / p) * eye)


def _dot_kkt(x, y):
    """(n,Kc) x (n,Kc) -> (n,n), contracting the K axis on the MXU."""
    return jax.lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=x.dtype
    )


# ---------------------------------------------------------------------------
# masked elite refit (CEMPPI)
# ---------------------------------------------------------------------------

def _masked_refit_kernel(
    mu_ref, e_ref, w_ref, l_ref, a_ref, b_ref,
    *, n: int, m: int, nk: int, method: str, jitter: float, corrected: bool,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        a_ref[...] = jnp.zeros_like(a_ref)
        if b_ref is not None:
            b_ref[...] = jnp.zeros_like(b_ref)

    xc = (e_ref[...] - mu_ref[...]) * w_ref[...]  # (n, Kc); w is 0/1
    a_ref[...] += _dot_kkt(xc, xc)
    if b_ref is not None:
        x2 = xc * xc
        b_ref[...] += _dot_kkt(x2, x2)

    @pl.when(i == nk - 1)
    def _finalize():
        b = b_ref[...] if b_ref is not None else None
        sigma = _shrink_finalize(a_ref[...], b, n, m, method, l_ref.dtype)
        l_ref[...] = _chol_inplace(_jitter_mat(sigma, n, jitter), n)

    del corrected


def _weighted_refit_kernel(
    mu_ref, e_ref, w_ref, l_ref, a_ref, b_ref,
    *, n: int, m: int, nk: int, method: str, jitter: float, corrected: bool,
):
    """Probability-weighted covariance (StatsBase uncorrected form):
    Sigma = sum_k w_k (x_k-mu)(x_k-mu)^T, optionally * K/(K-1) (PMC's
    corrected moments with w = counts/K)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        a_ref[...] = jnp.zeros_like(a_ref)

    xc = e_ref[...] - mu_ref[...]  # (n, Kc)
    a_ref[...] += _dot_kkt(xc * w_ref[...], xc)

    @pl.when(i == nk - 1)
    def _finalize():
        sigma = a_ref[...]
        if corrected:
            sigma = sigma * (m / (m - 1.0))
        l_ref[...] = _chol_inplace(_jitter_mat(sigma, n, jitter), n)

    del method


def _refit_call(kernel_body, e, w, mu, m, method, jitter, corrected, interpret):
    n, k = e.shape
    dtype = e.dtype
    kc = k if k <= 2048 else 2048
    if k % kc != 0:  # pad K with zero mask/weight columns (no contribution)
        k_pad = ((k + kc - 1) // kc) * kc
        e = jnp.pad(e, ((0, 0), (0, k_pad - k)))
        w = jnp.pad(w, ((0, k_pad - k),))
        k = k_pad
    nk = k // kc
    need_b = method in ("lw", "ss")
    scratch = [pltpu.VMEM((n, n), dtype)]
    scratch.append(pltpu.VMEM((n, n), dtype) if need_b else None)

    def body(mu_ref, e_ref, w_ref, l_ref, a_ref, b_ref=None):
        kernel_body(
            mu_ref, e_ref, w_ref, l_ref, a_ref, b_ref,
            n=n, m=m, nk=nk, method=method, jitter=jitter, corrected=corrected,
        )

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        grid=(nk,),
        in_specs=[
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, kc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[s for s in scratch if s is not None],
        interpret=interpret,
    )(mu.reshape(n, 1), e, w.reshape(1, k))


@functools.partial(
    jax.jit, static_argnames=("m", "method", "jitter", "interpret")
)
def masked_refit_chol(
    e: jnp.ndarray,
    mask: jnp.ndarray,
    mu: jnp.ndarray,
    m: int,
    method: str = "mle",
    jitter: float = 1e-8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused cholesky_lower(_jittered(shrinkage_cov_masked(e, mask, m))).

    e (cs,K) samples, mask (K,) 0/1 elite mask selecting exactly m columns,
    mu (cs,) the elite mean (e @ mask / m, computed by the caller who also
    needs it for the mean shift). One Pallas program; K chunked.
    """
    return _refit_call(
        _masked_refit_kernel, e, mask, mu, m, method, jitter, False, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("corrected", "jitter", "interpret")
)
def weighted_refit_chol(
    e: jnp.ndarray,
    w: jnp.ndarray,
    mu: jnp.ndarray,
    corrected: bool = False,
    jitter: float = 1e-8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused cholesky_lower(_jittered(weighted cov)) for muSigma-AIS/PMC.

    w (K,) probability weights (sum 1); corrected multiplies by K/(K-1)
    (PMC's resampled moments with w = counts/K, ref :807).
    """
    k = e.shape[1]
    return _refit_call(
        _weighted_refit_kernel, e, w, mu, k, "w", jitter, corrected, interpret
    )


# ---------------------------------------------------------------------------
# CMA tail (Sigma^{-1/2} + paths + step size + rank-mu + Cholesky)
# ---------------------------------------------------------------------------

def _cma_kernel(
    scal_ref, sigma_ref, dw_ref, ps_ref, pS_ref, svals_ref, ws_ref,
    chol_ref, sigma_out_ref, ps_out_ref, pS_out_ref, sig_s_ref,
    *, n: int, k: int, consts: dict, jitter: float, guards: bool,
    ns_its: int, quirk: bool, update_chol: bool,
):
    dtype = sigma_ref.dtype
    sigma_s = scal_ref[0, 0]
    it_f = scal_ref[0, 1]
    Sigma = sigma_ref[...]
    dw = dw_ref[...]  # (n, 1)
    eye = _eye_mask(n, dtype)

    c_sigma = consts["c_sigma"]
    d_sigma = consts["d_sigma"]
    c_Sigma = consts["c_Sigma"]
    mu_eff = consts["mu_eff"]
    c1 = consts["c1"]
    c_mu = consts["c_mu"]
    e_norm = consts["e_norm"]

    # C = Sigma^{-1/2} by coupled Newton-Schulz (matmul-only; the fused
    # path's stand-in for eigh — cf. strategies._inv_sqrt_newton_schulz).
    s_tr = jnp.sum(Sigma * eye)
    y = Sigma / s_tr

    def ns_body(_, yz):
        y, z = yz
        t = 1.5 * eye - 0.5 * jnp.dot(z, y, preferred_element_type=dtype)
        return (
            jnp.dot(y, t, preferred_element_type=dtype),
            jnp.dot(t, z, preferred_element_type=dtype),
        )

    _, z = jax.lax.fori_loop(0, ns_its, ns_body, (y, eye))
    c_mat = z / jnp.sqrt(s_tr)

    # matvec as a VPU broadcast-reduce (a (n,1)-lane MXU matmul wins nothing)
    c_dw = jnp.sum(c_mat * dw.reshape(1, n), axis=1, keepdims=True)
    p_sigma = (1.0 - c_sigma) * ps_ref[...] + jnp.sqrt(
        c_sigma * (2.0 - c_sigma) * mu_eff
    ) * c_dw
    norm_ps = jnp.sqrt(jnp.sum(p_sigma * p_sigma))
    step_exp = c_sigma / d_sigma * (norm_ps / e_norm - 1.0)
    if guards:
        step_exp = jnp.clip(step_exp, -20.0, 20.0)
    sigma_new = sigma_s * jnp.exp(step_exp)
    if guards:
        sigma_new = jnp.clip(sigma_new, 1e-10, 1e10)

    # (1-c_sigma)^(2 it_f) with traced it_f as exp(2 it_f ln(1-c_sigma))
    # (concrete-base pow lowers through transcendentals Mosaic may lack)
    import math as _math

    decay = jnp.exp(2.0 * it_f * _math.log(1.0 - c_sigma))
    denom = jnp.sqrt(1.0 - decay)
    h_sigma = (norm_ps / denom < (1.4 + 2.0 / (n + 1.0)) * e_norm).astype(dtype)
    p_Sigma = (1.0 - c_Sigma) * pS_ref[...] + h_sigma * jnp.sqrt(
        c_Sigma * (2.0 - c_Sigma) * mu_eff
    ) * dw

    assert quirk, "fused CMA kernel covers the quirk rank-mu form"
    svals = svals_ref[...]  # (1, K) scalar gathers done by the caller
    ws = ws_ref[...]  # (1, K)
    norm_c2 = jnp.sum(c_mat * c_mat)
    w0 = jnp.where(
        ws >= 0.0,
        ws,
        it_f * ws / jnp.maximum(norm_c2 * svals * svals, 1e-30),
    )
    rank_mu = jnp.sum(w0 * svals * svals)  # scalar

    Sigma_new = (
        (1.0 - c1 - c_mu) * Sigma
        + c1
        * (
            p_Sigma * p_Sigma.reshape(1, n)  # outer product by broadcast
            + (1.0 - h_sigma) * c_Sigma * (2.0 - c_Sigma) * Sigma
        )
        + c_mu * rank_mu
    )
    # triu + triu(.,1).T symmetrization via iota masks
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    upper = jnp.where(rows <= cols, Sigma_new, 0.0)
    strict = jnp.where(rows < cols, Sigma_new, 0.0)
    Sigma_new = upper + strict.T

    sigma_out_ref[...] = Sigma_new
    ps_out_ref[...] = p_sigma
    pS_out_ref[...] = p_Sigma
    # Mosaic cannot store rank-0 scalars to VMEM ("Cannot store scalars to
    # VMEM", caught on the real TPU — interpret mode accepts it silently);
    # broadcast to the (1, 1) block instead.
    sig_s_ref[...] = jnp.broadcast_to(sigma_new, (1, 1)).astype(dtype)
    if update_chol:
        l = _chol_inplace(_jitter_mat(Sigma_new, n, jitter), n)
        chol_ref[...] = sigma_new * l
    else:
        chol_ref[...] = jnp.zeros((n, n), dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "consts_t", "jitter", "guards", "ns_its", "quirk", "update_chol",
        "interpret",
    ),
)
def cma_update_chol(
    Sigma: jnp.ndarray,
    dw: jnp.ndarray,
    p_sigma: jnp.ndarray,
    p_Sigma: jnp.ndarray,
    svals: jnp.ndarray,
    ws: jnp.ndarray,
    sigma_s: jnp.ndarray,
    it_f: jnp.ndarray,
    consts_t: tuple,
    jitter: float,
    guards: bool = True,
    ns_its: int = 20,
    quirk: bool = True,
    update_chol: bool = True,
    interpret: bool = False,
):
    """Fused CMA covariance/step-size/path update + scaled Cholesky.

    Covers mppi_mpopi_policies.jl:578-606 from delta_w onward, with
    Sigma^{-1/2} by Newton-Schulz (the fused path always uses the matmul
    form; the unfused default keeps eigh — cfg.cma_fast_sqrt semantics).
    The caller does the (K,)-sized bookkeeping that needs gathers
    (argsort ranks, svals = ds_flat[order], the rank weights) in XLA.

    consts_t: tuple(sorted(dict(...))) of the CMAStrategy scalar constants.
    Returns (chol_scaled, Sigma_new, p_sigma, p_Sigma, sigma_new).
    """
    n = Sigma.shape[0]
    k = svals.shape[0]
    dtype = Sigma.dtype
    consts = dict(consts_t)
    scal = jnp.stack([sigma_s.astype(dtype), it_f.astype(dtype)]).reshape(1, 2)
    out = pl.pallas_call(
        functools.partial(
            _cma_kernel, n=n, k=k, consts=consts, jitter=jitter,
            guards=guards, ns_its=ns_its, quirk=quirk, update_chol=update_chol,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, n), dtype),
            jax.ShapeDtypeStruct((n, n), dtype),
            jax.ShapeDtypeStruct((n, 1), dtype),
            jax.ShapeDtypeStruct((n, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scalars (1,2)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Sigma
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw (n,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # p_sigma (n,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # p_Sigma (n,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # svals (1,K)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ws (1,K)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        scal,
        Sigma,
        dw.reshape(n, 1),
        p_sigma.reshape(n, 1),
        p_Sigma.reshape(n, 1),
        svals.reshape(1, k),
        ws.reshape(1, k),
    )
    chol, Sigma_new, ps, pS, sig = out
    return chol, Sigma_new, ps.reshape(n), pS.reshape(n), sig.reshape(())
