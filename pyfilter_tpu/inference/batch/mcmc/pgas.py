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
    """One conditional-SMC sweep: returns a fresh trajectory whose law leaves
    the smoothing posterior ``p(x_{0:T} | y, \\theta)`` invariant when
    ``ref_traj`` is the retained path.

    Bootstrap proposal, multinomial resampling per observation (the standard
    CSMC construction). ``ancestor_sampling=False`` gives plain conditional
    SMC (slot 0 keeps its own lineage).

    ``observe_every_step > 1`` is supported by recording SUB-STEP states: the
    retained trajectory follows the filters' recorded-history layout
    ``[x_0, x_first-corr, (oes sub-steps) x (T-1)]`` of length
    ``2 + (T-1)*oes`` (the first observation is corrected after ONE
    transition — BaseFilter.filter's first_step timing). The ancestor-
    sampling weight uses the FIRST sub-step's transition density
    ``f(x*_{t,1} | x_{t-1}^j)`` — the only factor of the retained path's
    density that depends on the ancestor.
    """
    hidden = model.hidden
    ev = hidden.event_ndim
    oes = int(model.observe_every_step)
    y = jnp.asarray(y)
    n_obs = y.shape[0]
    expected_len = 2 + (n_obs - 1) * oes
    if ref_traj.shape[0] != expected_len:
        raise ValueError(
            f"retained trajectory has {ref_traj.shape[0]} states; "
            f"oes={oes} with {n_obs} observations needs {expected_len} "
            "(record sub-step states — record_intermediary=True)"
        )

    k_init, k_first, k_scan, k_draw = jax.random.split(key, 4)

    init = hidden.initial_sample(k_init, (n_particles,))
    vals0 = init.value.at[0].set(ref_traj[0])
    lw0 = jnp.zeros((n_particles,), vals0.dtype if vals0.dtype.kind == "f" else jnp.float32)
    event_shape = ref_traj.shape[1:]

    def ancestors(k, vals, lw, t, ref_next):
        k_anc, k_as = jax.random.split(k)
        logits = normalize_log(lw)  # (N,)
        anc = jax.random.categorical(k_anc, logits, shape=(n_particles,))
        if ancestor_sampling:
            # slot 0 resampled against w_{t-1}^j · f(x*_next | x_{t-1}^j)
            trans_lp = hidden.build_density(TimeseriesState(t, vals, ev)).log_prob(ref_next)
            a0 = jax.random.categorical(k_as, logits + trans_lp)
        else:
            a0 = jnp.asarray(0, anc.dtype)
        return anc.at[0].set(a0)

    def weight(vals, t, y_t):
        lp = model.build_density(TimeseriesState(t, vals, ev)).log_prob(y_t)
        # all-NaN observation → skip (uniform weights), matching the filters
        return jnp.where(jnp.isnan(y_t).all(), jnp.zeros_like(lp), lp)

    # first observation: ONE transition from t=0 (first_step timing)
    k_anc0, k_prop0 = jax.random.split(k_first)
    anc0 = ancestors(k_anc0, vals0, lw0, jnp.asarray(0.0), ref_traj[1])
    picked = batched_gather(vals0, anc0, ev)
    prop = hidden.propagate(k_prop0, TimeseriesState(jnp.asarray(0.0), picked, ev))
    vals1 = prop.value.at[0].set(ref_traj[1])
    lw1 = weight(vals1, jnp.asarray(1.0), y[0])

    if n_obs == 1:
        idx_last = jax.random.categorical(k_draw, normalize_log(lw1))
        x1 = jnp.take(vals1, idx_last, axis=0)
        x0 = jnp.take(vals0, jnp.take(anc0, idx_last), axis=0)
        return jnp.stack([x0, x1], axis=0)

    # remaining observations: oes sub-steps each, every sub-step recorded
    # and slot 0 pinned to the corresponding retained sub-state
    ref_subs = ref_traj[2:].reshape((n_obs - 1, oes) + event_shape)

    def step(carry, inp):
        vals, lw, t = carry
        y_t, ref_s, k = inp  # ref_s: (oes, *event)
        k_a, *k_props = jax.random.split(k, 1 + oes)

        anc = ancestors(k_a, vals, lw, t, ref_s[0])
        cur = batched_gather(vals, anc, ev)
        subs = []
        for i in range(oes):  # static unroll: sub-steps never resample
            prop = hidden.propagate(k_props[i], TimeseriesState(t + i, cur, ev))
            cur = prop.value.at[0].set(ref_s[i])
            subs.append(cur)
        t_new = t + oes
        new_lw = weight(cur, t_new, y_t)
        return (cur, new_lw, t_new), (jnp.stack(subs), new_lw, anc)

    keys = jax.random.split(k_scan, n_obs - 1)
    (_, lw_last, _), (all_subs, _, all_anc) = jax.lax.scan(
        step, (vals1, lw1, jnp.asarray(1.0)), (y[1:], ref_subs, keys)
    )

    # backward genealogy trace from a draw of the final weights (sub-steps
    # share their observation step's particle index — no resampling between)
    idx_last = jax.random.categorical(k_draw, normalize_log(lw_last))

    def back(idx, inp):
        subs_t, anc_t = inp  # (oes, N, *event), (N,)
        out = jnp.take(subs_t, idx, axis=1)  # (oes, *event)
        return jnp.take(anc_t, idx, axis=0), out

    idx1, traj_subs = jax.lax.scan(back, idx_last, (all_subs, all_anc), reverse=True)
    x1 = jnp.take(vals1, idx1, axis=0)
    x0 = jnp.take(vals0, jnp.take(anc0, idx1), axis=0)
    flat_subs = traj_subs.reshape(((n_obs - 1) * oes,) + event_shape)
    return jnp.concatenate([x0[None], x1[None], flat_subs], axis=0)


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
    trajectory. ``observe_every_step > 1`` is supported: the retained path
    carries sub-step states (the filters' recorded-history layout), so the
    flagship SDE workloads (e.g. stochastic volatility at oes=5) can be
    PGAS'd.
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
        oes = int(filt.model.observe_every_step)
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
        # (sub-step states recorded when oes > 1 — the retained path follows
        # the filters' history layout, length 2 + (T-1)*oes)
        def init_traj(theta_c, k):
            k_filter, k_smooth = jax.random.split(k)
            filt2 = self._filter.initialize_model(
                ctx.unstack_parameters(theta_c, constrained=False)
            ).replace(record_states=True, record_intermediary=oes > 1)
            res = filt2.batch_filter(k_filter, y, use_jit=False)
            return filt2.smooth(k_smooth, res, method="ffbs")[:, 0]

        trajs = jax.jit(jax.vmap(init_traj))(
            thetas0, jax.random.split(k_traj, c)
        )  # (C, 2 + (T-1)*oes, *event)
        times = jnp.arange(2 + (y.shape[0] - 1) * oes, dtype=jnp.float32)

        def joint(theta, trajectory):
            ctx2 = ctx.unstack_parameters(theta, constrained=False)
            model = self._filter.initialize_model(ctx2).model
            ll = smoothed_joint_log_likelihood(
                model, times, trajectory[:, None], y, oes=oes
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
