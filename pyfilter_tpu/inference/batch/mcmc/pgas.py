"""PGAS — particle Gibbs with ancestor sampling (Lindsten, Jordan & Schön 2014).

New capability beyond the reference (whose only batch PMCMC kernel is PMMH,
pyfilter/inference/batch/mcmc/pmmh.py): a conditional-SMC Gibbs sampler over
the joint posterior :math:`p(\\theta, x_{0:T} | y_{1:T})`. Each iteration

1. refreshes the retained trajectory with a conditional SMC sweep in which
   particle slot 0 is pinned to the reference path and its ancestor is
   *resampled* against :math:`\\bar w_{t-1}^j\\, f(x^*_t | x_{t-1}^j)`
   (ancestor sampling — breaks the path-degeneracy that plain particle Gibbs
   suffers at long T), then
2. moves :math:`\\theta` by Metropolis-Hastings against the EXACT joint
   density of the retained trajectory (an O(T) density evaluation via
   ``smoothed_joint_log_likelihood`` — no O(T·N) re-filter per proposal,
   which is PMMH's per-iteration cost).

The whole chain runs as one compiled ``lax.scan`` over iterations (inner scan
over time), chunked like the fused PMMH chain — the SMC2 dispatch-fusion
recipe applied to a Gibbs kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ....filters.particle.base import smoothed_joint_log_likelihood
from ....timeseries import TimeseriesState
from ....utils import batched_gather, normalize_log
from ... import prior as prior_ops
from ...base import BaseAlgorithm
from ...logging import TQDMWrapper


def csmc_sweep(key, model, y, ref_traj, n_particles: int, ancestor_sampling: bool = True):
    """One conditional-SMC sweep: returns a fresh trajectory ``(T+1, *event)``
    whose law leaves the smoothing posterior ``p(x_{0:T} | y, \\theta)``
    invariant when ``ref_traj`` is the retained path.

    Bootstrap proposal, multinomial resampling every step (the standard CSMC
    construction). ``ancestor_sampling=False`` gives plain conditional SMC
    (slot 0 keeps its own lineage).
    """
    hidden = model.hidden
    ev = hidden.event_ndim
    y = jnp.asarray(y)
    n_obs = y.shape[0]

    k_init, k_scan, k_draw = jax.random.split(key, 3)

    init = hidden.initial_sample(k_init, (n_particles,))
    vals0 = init.value.at[0].set(ref_traj[0])

    def step(carry, inp):
        vals, lw, t = carry
        y_t, ref_t, k = inp
        k_anc, k_as, k_prop = jax.random.split(k, 3)

        logits = normalize_log(lw)  # (N,)
        anc = jax.random.categorical(k_anc, logits, shape=(n_particles,))

        state_prev = TimeseriesState(t, vals, ev)
        if ancestor_sampling:
            # ancestor-sample slot 0 against w_{t-1}^j · f(x*_t | x_{t-1}^j)
            trans_lp = hidden.build_density(state_prev).log_prob(ref_t)  # (N,)
            a0 = jax.random.categorical(k_as, logits + trans_lp)
        else:
            a0 = jnp.asarray(0, anc.dtype)
        anc = anc.at[0].set(a0)

        picked = batched_gather(vals, anc, ev)
        prop = hidden.propagate(k_prop, TimeseriesState(t, picked, ev))
        new_vals = prop.value.at[0].set(ref_t)

        state_new = TimeseriesState(t + 1.0, new_vals, ev)
        lp = model.build_density(state_new).log_prob(y_t)  # (N,)
        # all-NaN observation → skip (uniform weights), matching the filters
        new_lw = jnp.where(jnp.isnan(y_t).all(), jnp.zeros_like(lp), lp)
        return (new_vals, new_lw, t + 1.0), (new_vals, new_lw, anc)

    keys = jax.random.split(k_scan, n_obs)
    lw0 = jnp.zeros((n_particles,), vals0.dtype if vals0.dtype.kind == "f" else jnp.float32)
    (_, lw_last, _), (all_vals, all_lw, all_anc) = jax.lax.scan(
        step, (vals0, lw0, jnp.asarray(0.0)), (y, ref_traj[1:], keys)
    )

    # backward genealogy trace from a draw of the final weights
    idx_last = jax.random.categorical(k_draw, normalize_log(lw_last))

    def back(idx, inp):
        vals_t, anc_t = inp
        out = jnp.take(vals_t, idx, axis=0)
        return jnp.take(anc_t, idx, axis=0), out

    idx0, traj_rest = jax.lax.scan(back, idx_last, (all_vals, all_anc), reverse=True)
    x0 = jnp.take(vals0, idx0, axis=0)
    return jnp.concatenate([x0[None], traj_rest], axis=0)


class PGASResult:
    """Per-iteration parameter draws; ``samples[name]`` stacks to
    ``(num_samples, *event)`` for a single chain and
    ``(num_samples, num_chains, *event)`` for several.

    ``as_arrays`` always exposes the chain axis
    ``(num_samples, num_chains, *event)`` so the chain diagnostics compose
    directly: ``inference.summarize_chains(pgas_result)`` (with one chain,
    split-R-hat halves it — the conventional single-chain diagnostic)."""

    def __init__(self, samples, acceptance_rate, trajectory, num_chains: int = 1):
        self.samples = samples
        self.acceptance_rate = float(acceptance_rate)
        self.trajectory = trajectory
        self.num_chains = int(num_chains)

    def as_arrays(self):
        if self.num_chains == 1:
            return {k: np.asarray(v)[:, None] for k, v in self.samples.items()}
        return {k: np.asarray(v) for k, v in self.samples.items()}


class PGAS(BaseAlgorithm):
    """Particle Gibbs with ancestor sampling over ``filter_``'s model builder.

    ``filter_`` supplies the model builder and ``n_particles`` (its proposal
    is unused — CSMC is bootstrap by construction). Single chain; the θ-move
    is a random-walk MH on the unconstrained parameter space with step size
    ``rw_scale``, targeting the exact joint density of the retained
    trajectory. Requires ``observe_every_step == 1``.
    """

    _default_chunk_size: int = 256

    def __init__(
        self,
        filter_,
        num_samples: int,
        rw_scale: float = 5e-2,
        ancestor_sampling: bool = True,
        num_theta_steps: int = 5,
        initializer: str = "mean",
        num_chains: int = 1,
        chain_jitter: float = 0.1,
        context=None,
        key=None,
    ):
        """``num_theta_steps``: MH θ-moves per Gibbs sweep — each is an O(T)
        density evaluation (vs the sweep's O(T·N)), so several per sweep mix
        the tight θ | x conditional at negligible cost. ``initializer``:
        ``"mean"`` starts the chain at the prior mean (unconstrained-space MC
        estimate, the PMMH default); ``"sample"`` keeps the context's prior
        draw.

        ``num_chains`` > 1 runs independent Gibbs chains ``vmap``-ed through
        one compiled scan (split-R̂ needs ≥ 2 chains), each started at the
        initializer plus ``chain_jitter``·N(0,1) on the unconstrained space
        (overdispersed starts, as the diagnostic assumes)."""
        super().__init__(filter_=filter_, context=context, key=key)
        self.num_samples = int(num_samples)
        self.rw_scale = float(rw_scale)
        self.ancestor_sampling = bool(ancestor_sampling)
        self.num_theta_steps = max(int(num_theta_steps), 1)
        if initializer not in ("mean", "sample"):
            raise ValueError("initializer must be 'mean' or 'sample'")
        self.initializer = initializer
        self.num_chains = max(int(num_chains), 1)
        self.chain_jitter = float(chain_jitter)

        self.context.set_batch_shape(())
        self._filter = self._filter.set_batch_shape(())

    def fit(self, y, logging=None, chunk_size: int = None) -> PGASResult:
        y = jnp.asarray(y)
        filt = self._filter.initialize_model(self.context)
        if int(filt.model.observe_every_step) != 1:
            raise NotImplementedError(
                "PGAS requires observe_every_step == 1 (the CSMC sweep pins "
                "the reference path at every transition)"
            )
        n = filt.n_particles
        ctx = self.context
        key = self._next_key()
        k_init, k_mean, k_chain = jax.random.split(key, 3)

        if self.initializer == "mean":
            # start at the unconstrained prior mean (MC estimate) — a random
            # prior draw can cost hundreds of sweeps of burn-in
            parts = []
            for name, k_p in zip(
                ctx.parameters, jax.random.split(k_mean, max(len(ctx.parameters), 1))
            ):
                prior = ctx.get_prior(name)
                draws = prior.sample(k_p, (4096,))
                u = prior_ops.get_unconstrained(prior, draws)
                parts.append(jnp.reshape(u, (4096, -1)).mean(axis=0))
            theta0 = jnp.concatenate(parts)[None]  # (1, D)
        else:
            theta0 = ctx.stack_parameters(constrained=False)  # (1, D)

        c = self.num_chains
        k_jit, k_traj = jax.random.split(k_init)
        thetas0 = theta0[None] + (
            self.chain_jitter
            * jax.random.normal(k_jit, (c,) + theta0.shape, theta0.dtype)
            if c > 1
            else jnp.zeros((c,) + theta0.shape, theta0.dtype)
        )  # (C, 1, D)

        # initialize each chain's retained trajectory with one FFBS draw
        def init_traj(theta_c, k):
            k_filter, k_smooth = jax.random.split(k)
            filt2 = self._filter.initialize_model(
                ctx.unstack_parameters(theta_c, constrained=False)
            ).replace(record_states=True)
            res = filt2.batch_filter(k_filter, y, use_jit=False)
            return filt2.smooth(k_smooth, res, method="ffbs")[:, 0]

        trajs = jax.jit(jax.vmap(init_traj))(
            thetas0, jax.random.split(k_traj, c)
        )  # (C, T+1, *event)
        times = jnp.arange(y.shape[0] + 1, dtype=jnp.float32)

        def joint(theta, trajectory):
            ctx2 = ctx.unstack_parameters(theta, constrained=False)
            model = self._filter.initialize_model(ctx2).model
            ll = smoothed_joint_log_likelihood(
                model, times, trajectory[:, None], y, oes=1
            )
            return jnp.sum(ll) + jnp.sum(ctx2.eval_priors(constrained=False)), model

        def body(carry, k):
            theta, trajectory = carry
            k_sweep, k_theta = jax.random.split(k)

            # (1) trajectory refresh by conditional SMC given θ
            _, model = joint(theta, trajectory)
            trajectory = csmc_sweep(
                k_sweep, model, y, trajectory, n, self.ancestor_sampling
            )

            # (2) θ | trajectory: num_theta_steps random-walk MH moves on the
            # exact joint — O(T) each, so cheap relative to the sweep
            def mh_move(th_lp, k_i):
                th, lp_cur = th_lp
                k_prop, k_acc = jax.random.split(k_i)
                th_star = th + self.rw_scale * jax.random.normal(
                    k_prop, th.shape, th.dtype
                )
                lp_star, _ = joint(th_star, trajectory)
                accept = jnp.log(jax.random.uniform(k_acc, ())) < lp_star - lp_cur
                th = jnp.where(accept, th_star, th)
                lp_cur = jnp.where(accept, lp_star, lp_cur)
                return (th, lp_cur), accept

            lp0, _ = joint(theta, trajectory)
            (theta, _), accepts = jax.lax.scan(
                mh_move, (theta, lp0), jax.random.split(k_theta, self.num_theta_steps)
            )
            return (theta, trajectory), (theta, jnp.mean(accepts))

        chunk = self.num_samples if chunk_size is None else max(int(chunk_size), 1)
        if chunk_size is None:
            chunk = min(self.num_samples, self._default_chunk_size)

        chain_body = jax.vmap(body)  # chains ride a vmapped leading axis

        def masked_step(carry, inp):
            # fixed-size chunks with a validity flag: the remainder chunk
            # rides the SAME executable (no retrace of the whole sweep graph
            # for a one-off shape — the fused-PMMH padding recipe); invalid
            # steps skip the sweep entirely via lax.cond
            ks, valid = inp

            def run(op):
                return chain_body(op, ks)

            def skip(op):
                return op, (op[0], jnp.zeros((c,)))

            return jax.lax.cond(valid, run, skip, carry)

        scan_chunk = jax.jit(lambda carry, inp: jax.lax.scan(masked_step, carry, inp))

        thetas, accepts = [], []
        carry = (thetas0, trajs)
        done = 0
        logger = logging if logging is not None else TQDMWrapper()
        with logger.initialize(self, self.num_samples):
            while done < self.num_samples:
                m = min(chunk, self.num_samples - done)
                k_chain, k_use = jax.random.split(k_chain)
                ks = jax.random.split(k_use, (chunk, c))
                valid = jnp.arange(chunk) < m
                carry, (th, acc) = scan_chunk(carry, (ks, valid))
                thetas.append(np.asarray(th)[:m])
                accepts.append(np.asarray(acc)[:m])
                done += m
                logger.do_log(done, None)

        theta_chain = np.concatenate(thetas, axis=0)  # (S, C, 1, D)
        acc_rate = float(np.concatenate(accepts).mean())

        # unstack the recorded chains into named constrained samples:
        # (S, *event) for a single chain, (S, C, *event) for several
        samples = {}
        chain = jnp.asarray(theta_chain[:, :, 0])  # (S, C, D)
        s_len = chain.shape[0]
        index = 0
        for name in ctx.parameters:
            shape = ctx.get_shape(name, constrained=False)
            numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
            block = chain[:, :, index : index + numel].reshape((s_len, c) + shape)
            if c == 1:
                block = block[:, 0]
            samples[name] = np.asarray(
                prior_ops.get_constrained(ctx.get_prior(name), block)
            )
            index += numel

        # absorb the final draw (chain 0) into the user-held context
        final_ctx = ctx.unstack_parameters(carry[0][0], constrained=False)
        ctx.absorb(final_ctx)
        return PGASResult(samples, acc_rate, np.asarray(carry[1]), num_chains=c)
