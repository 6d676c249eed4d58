"""PMMH — particle marginal Metropolis-Hastings.

Re-design of the reference's ``pyfilter/inference/batch/mcmc/pmmh.py``
(Andrieu et al.): ``num_chains`` vectorized chains ride one lane axis through
the filter; every iteration is one :func:`run_pmmh` full re-filter.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...base import BaseAlgorithm
from ...context import InferenceContext, QuasiInferenceContext
from ...logging import TQDMWrapper
from ...sequential.base import _split_chain
from .proposals import BaseProposal, RandomWalk
from .state import PMMHResult
from .utils import _pmmh_chain_scan, run_pmmh


class PMMH(BaseAlgorithm):
    MONTE_CARLO_SAMPLES = (10_000,)
    #: samples advanced per compiled chain scan before the host fetches the
    #: chunk's records (one dispatch + one transfer per chunk instead of ~80
    #: dispatches per sample — the SMC2 fusion recipe applied to batch PMMH)
    _default_chunk_size: int = 128

    def __init__(
        self,
        filter_,
        num_samples: int,
        num_chains: int = 4,
        proposal: BaseProposal = None,
        initializer: str = "mean",
        context=None,
        key=None,
        mesh=None,
        lane_axis: str = "lanes",
        num_seeds: int = 200,
    ):
        """``mesh`` (optional): shard the vectorized chains over the mesh's
        ``lane_axis`` — each device runs its own chains' full re-filters.

        ``initializer``: ``"mean"`` starts every chain at the prior mean
        (10k-sample MC estimate, reference pmmh.py:59-74); ``"seed"`` draws
        ``num_seeds`` prior samples, scores each with ONE vectorized filtering
        pass, and starts the chains at the ``num_chains`` highest-likelihood
        draws (the reference documents this mode but leaves it
        ``NotImplementedError``, pmmh.py:62-63 — implemented here, with top-k
        rather than a single argmax so the chains stay dispersed)."""
        super().__init__(filter_=filter_, context=context, key=key)

        self.num_samples = int(num_samples)
        self.num_chains = int(num_chains)

        self.context.set_batch_shape((self.num_chains,))
        self._filter = self._filter.set_batch_shape((self.num_chains,))

        self._proposal = proposal or RandomWalk()
        if initializer not in ("mean", "seed"):
            raise NotImplementedError(f"`{initializer}` is not configured!")
        self._initializer = initializer
        self._num_seeds = max(int(num_seeds), self.num_chains)
        self._mesh = mesh
        self._lane_axis = (
            lane_axis
            if mesh is not None and lane_axis in getattr(mesh, "axis_names", ())
            else None
        )

    def _place_filter(self, filt):
        if self._mesh is None or self._lane_axis is None:
            return filt
        from ....parallel import lane_sharded_filter

        return lane_sharded_filter(filt, self._mesh, lane_axis=self._lane_axis)

    def initialize(self, y) -> PMMHResult:
        """Build the model, set the chains' starting values (``"mean"`` or
        ``"seed"`` — see ``__init__``), and run the initial full filter."""
        self.context.set_key(self._next_key())
        self._filter = self._filter.initialize_model(self.context)

        if self._initializer == "seed":
            self._seed_chains(jnp.asarray(y))
        else:
            for name in list(self.context.parameters):
                prior = self.context.get_prior(name)
                mean = jnp.mean(
                    prior.sample(self._next_key(), self.MONTE_CARLO_SAMPLES), axis=0
                )
                mean = jnp.broadcast_to(mean, (self.num_chains,) + tuple(prior.event_shape))
                self.context.update_parameter(name, mean)

        self._filter = self._place_filter(self._filter.initialize_model(self.context))
        prev_res = self._filter.batch_filter(self._next_key(), jnp.asarray(y))
        return PMMHResult(dict(self.context.parameters), prev_res)

    def _seed_chains(self, y) -> None:
        """``initializer="seed"``: score ``num_seeds`` prior draws with one
        ``num_seeds``-lane filtering pass and write the top ``num_chains``
        draws (by estimated loglik) into the context."""
        n_seeds = self._num_seeds
        seed_ctx = self.context._clone_registry()
        seed_ctx.batch_shape = (n_seeds,)
        for name in list(self.context.parameters):
            prior = self.context.get_prior(name)
            seed_ctx._value_dict[name] = prior.sample(self._next_key(), (n_seeds,))

        seed_filter = self._filter.set_batch_shape((n_seeds,)).initialize_model(seed_ctx)
        res = seed_filter.batch_filter(self._next_key(), y)
        ll = jnp.reshape(res.log_likelihood, (n_seeds,))
        ll = jnp.where(jnp.isfinite(ll), ll, -jnp.inf)
        best = jnp.argsort(ll)[::-1][: self.num_chains]
        for name, v in seed_ctx._value_dict.items():
            self.context.update_parameter(name, jnp.take(v, best, axis=0))

    def _fusible(self) -> bool:
        """The fused chain scan needs the full-core tier's conditions: a
        pytree context kind and a traceable proposal (see utils.run_pmmh)."""
        pytree_ctx = type(self.context) is InferenceContext or (
            type(self.context) is QuasiInferenceContext
            and not getattr(self._proposal, "uses_quasi_engine", False)
        )
        return pytree_ctx and getattr(self._proposal, "jit_compatible", False)

    def fit(self, y, logging=None, chunk_size: int | None = None) -> PMMHResult:
        """``chunk_size``: samples advanced per compiled ``lax.scan`` before
        the host fetches the chain records (default ``_default_chunk_size``
        when the proposal is traceable; pass 1 to force the per-sample
        reference-style loop — both paths are bit-identical)."""
        y = jnp.asarray(y)
        state = self.initialize(y)
        logging = logging or TQDMWrapper()

        if chunk_size is None:
            chunk_size = self._default_chunk_size if self._fusible() else 1
        chunk_size = int(chunk_size)

        with logging.initialize(self, self.num_samples):
            prop_kernel = self._proposal.build(
                self.context, state, self._filter, y, key=self._next_key()
            )

            if chunk_size > 1 and self._fusible():
                return self._fit_fused(y, state, prop_kernel, logging, chunk_size)

            for i in range(self.num_samples):
                step = run_pmmh(
                    self._next_key(),
                    self.context,
                    state,
                    self._proposal,
                    prop_kernel,
                    self._filter,
                    y,
                    mutate_kernel=True,
                )
                self.context.absorb(step.context)
                state.filter_state = step.filter_state
                prop_kernel = step.proposal_kernel
                self._filter = self._place_filter(self._filter.initialize_model(self.context))

                state.update_chain(dict(self.context.parameters))
                logging.do_log(i, state)

        return state

    def _fit_fused(self, y, state, prop_kernel, logging, chunk: int) -> PMMHResult:
        """The chain loop in compiled chunks: one dispatch per ``chunk``
        transitions, chain records stacked device-side and fetched once per
        chunk (key stream identical to the per-sample loop's)."""
        engine = getattr(self.context, "quasi_engine", None)

        done = 0
        while done < self.num_samples:
            n = min(chunk, self.num_samples - done)
            self._key, keys = _split_chain(self._key, n)
            if n < chunk:
                # pad the key block so n_steps stays the STATIC chunk size —
                # the remainder reuses the compiled scan (the padded steps are
                # device-side no-ops via n_valid and never consume real keys)
                pad = jnp.zeros((chunk - n,) + keys.shape[1:], keys.dtype)
                keys = jnp.concatenate([keys, pad], axis=0)
            ctx_new, fs_new, prop_kernel, recs, _rates = _pmmh_chain_scan(
                keys,
                self.context,
                state.filter_state,
                prop_kernel,
                self._filter,
                y,
                self._proposal,
                (),
                True,
                chunk,
                jnp.asarray(n),
            )
            self.context.absorb(ctx_new)
            if engine is not None:
                self.context.quasi_engine = engine
            state.filter_state = fs_new

            # one host transfer per chunk; slice into the per-name record the
            # reference's update_chain accumulates (state.py:28-38)
            recs_np = np.asarray(recs)[:n]  # (n, *batch, D) constrained
            index = 0
            for name in self.context.parameters:
                shape = self.context.get_shape(name, constrained=True)
                numel = int(np.prod(shape, dtype=np.int64)) if shape else 1
                vals = recs_np[..., index : index + numel].reshape(
                    recs_np.shape[:-1] + tuple(shape)
                )
                state.samples[name].extend(list(vals))
                index += numel

            done += n
            logging.do_log(done, state)

        self._filter = self._place_filter(self._filter.initialize_model(self.context))
        return state
