"""Host-environment policy driver.

For environments whose dynamics cannot be traced into XLA (real MuJoCo via
the native envpool_lite engine), the AIS loop runs as a host loop: the
policy math reuses the exact same strategy objects as the compiled driver
(executed eagerly on the CPU backend), while rollouts step the batched host
env — mirroring the reference's envpool path where the K sampled control
sequences are evaluated by stepping the K C++ environments in lockstep
(mppi_mpopi_policies.jl:240-259, utils.jl:103-121), but with O(1)
snapshot/restore instead of restore-by-replay.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mpopis_tpu.ops.controls import roll_controls
from mpopis_tpu.ops.weights import information_theoretic_weights
from mpopis_tpu.policies.config import PolicyConfig, PolicyState, init_policy_state
from mpopis_tpu.policies.driver import _prepare_cov, _prepare_u0, _block_diag_np, _principal_sqrtm
from mpopis_tpu.policies.strategies import AISCarry, CMAStrategy, NESStrategy, make_strategy


@dataclasses.dataclass(eq=False)
class HostPolicy:
    """Same public surface as Policy (init_state / step) over a host env.

    `env` must expose: num_envs, action_dim, action_low/high, step(actions
    (K, nu)) -> (obs, rews), snapshot(), restore().
    """

    env: object
    cfg: PolicyConfig
    u0_flat: np.ndarray
    sigma: np.ndarray

    def __post_init__(self):
        cfg = self.cfg
        self._cpu = jax.devices("cpu")[0]
        self._as = self.env.action_dim
        self._cs = self._as * cfg.horizon
        if cfg.num_samples != self.env.num_envs:
            raise ValueError(
                f"num_samples ({cfg.num_samples}) must equal env.num_envs "
                f"({self.env.num_envs}) for host-batched rollouts"
            )
        with jax.default_device(self._cpu):
            self._sigma_j = jnp.asarray(self.sigma, dtype=jnp.float64)
            if cfg.kind == "mppi":
                self._chol = jnp.linalg.cholesky(self._sigma_j)
                self._sigma_inv = jnp.linalg.inv(self._sigma_j)
                self._strategy = None
            else:
                self._chol = jnp.linalg.cholesky(self._sigma_j)
                self._strategy = make_strategy(cfg, self._cs, jnp.float64)
                if isinstance(self._strategy, NESStrategy):
                    self._extra0 = self._strategy.make_extra(
                        jnp.asarray(_principal_sqrtm(self.sigma))
                    )
                elif isinstance(self._strategy, CMAStrategy):
                    self._extra0 = self._strategy.make_extra(self._sigma_j)
                else:
                    self._extra0 = None

    def init_state(self, seed_or_key) -> PolicyState:
        with jax.default_device(self._cpu):
            return init_policy_state(
                jnp.asarray(self.u0_flat, dtype=jnp.float64), seed_or_key
            )

    # ------------------------------------------------------------------
    def _rollout(self, controls: np.ndarray) -> np.ndarray:
        """Evaluate (K, T, as) candidate controls on the host env; restores
        the pre-rollout state afterwards (ref utils.jl:103-121)."""
        k, t, _ = controls.shape
        costs = np.zeros(k)
        for ti in range(t):
            _, rews = self.env.step(controls[:, ti, :])
            costs -= rews
        self.env.restore()
        return costs

    def step(self, pol_state: PolicyState):
        cfg = self.cfg
        if cfg.kind == "mppi":
            return self._step_mppi(pol_state)
        return self._step_gmppi(pol_state)

    def _clamp(self, v_ktas: np.ndarray) -> np.ndarray:
        return np.clip(v_ktas, self.env.action_low, self.env.action_high)

    def _step_gmppi(self, pol_state: PolicyState):
        cfg = self.cfg
        k, t, as_, cs = cfg.num_samples, cfg.horizon, self._as, self._cs
        gamma = cfg.gamma
        strategy = self._strategy
        with jax.default_device(self._cpu):
            u_orig = pol_state.U
            key_next, key = jax.random.split(pol_state.key)
            carry = AISCarry(
                U=u_orig,
                chol=strategy.init_chol(self._chol),
                E=jnp.zeros((cs, k), dtype=jnp.float64),
                costs=jnp.zeros((k,), dtype=jnp.float64),
                trajs=None,
                done=jnp.asarray(False),
                key=key,
                extra=self._extra0,
            )
            self.env.snapshot()
            for n in range(cfg.opt_its):
                key, k_samp, k_strat = jax.random.split(carry.key, 3)
                z = jax.random.normal(k_samp, (cs, k), dtype=jnp.float64)
                e = carry.chol @ z
                v = carry.U[:, None] + e  # (cs, K)
                controls = self._clamp(
                    np.asarray(v).T.reshape(k, t, as_)
                )
                costs = self._rollout(controls)
                if gamma != 0.0:
                    zsol = jax.scipy.linalg.cho_solve((carry.chol, True), u_orig)
                    costs = costs + gamma * np.asarray(
                        (v - u_orig[:, None]).T @ zsol
                    )
                base = carry.replace(
                    E=e, costs=jnp.asarray(costs), key=key
                )
                if n == cfg.opt_its - 1:
                    carry = base
                    break
                new, stop = strategy.update(base, k_strat, u_orig, n + 1)
                if bool(stop):
                    carry = base
                    break
                carry = new.replace(key=key)

            e_final = carry.E + (carry.U - u_orig)[:, None]
            weights = information_theoretic_weights(carry.costs, cfg.lam)
            weighted_controls = u_orig + e_final @ weights
            action = np.clip(
                np.asarray(weighted_controls[:as_]),
                self.env.action_low, self.env.action_high,
            )
            u_next = roll_controls(
                weighted_controls, jnp.asarray(self.u0_flat), as_, cfg.shift_quirk
            )
            info = {"costs": np.asarray(carry.costs), "weights": np.asarray(weights)}
            return action, PolicyState(U=u_next, key=key_next), info

    def _step_mppi(self, pol_state: PolicyState):
        cfg = self.cfg
        k, t, as_ = cfg.num_samples, cfg.horizon, self._as
        gamma = cfg.gamma
        with jax.default_device(self._cpu):
            key_next, k_samp = jax.random.split(pol_state.key)
            z = jax.random.normal(k_samp, (k, t, as_), dtype=jnp.float64)
            e = z @ self._chol.T
            u_mat = pol_state.U.reshape(t, as_)
            controls = self._clamp(np.asarray(u_mat[None] + e))
            self.env.snapshot()
            costs = self._rollout(controls)
            if gamma != 0.0:
                costs = costs + gamma * np.asarray(
                    jnp.einsum("ta,ab,ktb->k", u_mat, self._sigma_inv, e)
                )
            weights = information_theoretic_weights(jnp.asarray(costs), cfg.lam)
            noise = jnp.einsum("k,kta->ta", weights, e).reshape(-1)
            weighted_controls = pol_state.U + noise
            action = np.clip(
                np.asarray(weighted_controls[:as_]),
                self.env.action_low, self.env.action_high,
            )
            u_next = roll_controls(
                weighted_controls, jnp.asarray(self.u0_flat), as_, cfg.shift_quirk
            )
            info = {"costs": np.asarray(costs), "weights": np.asarray(weights)}
            return action, PolicyState(U=u_next, key=key_next), info


def make_host_policy(env, cfg: PolicyConfig, u0=None, cov_mat=None) -> HostPolicy:
    as_ = env.action_dim
    cs = as_ * cfg.horizon
    u0_flat = _prepare_u0(u0, as_, cs)
    cov_block = _prepare_cov(cov_mat, as_)
    if cfg.kind == "mppi":
        sigma = cov_block
    elif cov_block.shape[0] == as_:
        sigma = _block_diag_np(cov_block, cfg.horizon)
    else:
        sigma = cov_block
    return HostPolicy(env=env, cfg=cfg, u0_flat=u0_flat, sigma=sigma)
