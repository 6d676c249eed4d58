"""Abstract filter: one-step ``filter`` and the ``lax.scan`` ``batch_filter``.

JAX re-design of the reference's ``pyfilter/filters/base.py``: the Python
``for y_t in tqdm(y)`` hot loop (base.py:140-158) becomes one ``lax.scan``; the
``observe_every_step`` sub-step ``while`` (base.py:204-210) becomes a static
unrolled loop (the count is a model constant); the all-NaN skip
(base.py:212-216) becomes a ``lax.cond``.

Filters are pytrees: the model is the only child (so parameters flow through
``jit``/``vmap``/``grad``); every config knob is static aux data. A filter is
therefore hashable-by-config and can be passed straight through ``jax.jit``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.tree_util import register_pytree_node

from .result import FilterHistory, FilterResult
from .state import ParticleFilterCorrection, ParticleFilterPrediction


class BaseFilter:
    """Abstract filter over a :class:`~pyfilter_tpu.timeseries.StateSpaceModel`.

    ``batch_shape`` vectorizes K independent filters through one set of tensor
    ops (the reference's vectorized-parallel-filters feature,
    filters/base.py:93-119) — unlike the reference, arbitrary lane shapes are
    supported, not just one dim.

    ``nan_strategy``: "skip" drops all-NaN observations (propagate only);
    "impute" additionally fills partially-NaN components with the predicted
    observation mean before correcting (the reference accepts but never
    implemented "impute", base.py:65-68 — conscious fix, SURVEY.md §8).

    COST WARNING — ``record_states=True`` / ``record_intermediary=True``
    inside SMC2/PMMH: recorded histories exclude the masked fused re-filter,
    so every rejuvenation falls back to a full ``batch_filter`` and the
    fused single-dispatch tiers are disabled. Measured on the flagship SMC2
    config this is a multiple of the fused wall-clock (PERF.md "recording
    cost cliff"). Plain filtering/smoothing is unaffected — the flags only
    tax the inference algorithms' rejuvenation path.
    """

    #: config attribute names that form the static aux data, in order.
    _config_fields: tuple = (
        "record_states",
        "record_intermediary",
        "nan_strategy",
        "batch_shape",
        "model_builder",
    )

    def __init__(
        self,
        model,
        record_states: bool = False,
        record_intermediary: bool = False,
        nan_strategy: str = "skip",
        batch_shape=(),
    ):
        if nan_strategy not in ("skip", "impute"):
            raise ValueError("nan_strategy must be 'skip' or 'impute'")
        # the reference accepts a model OR a model-builder
        # ``Callable[[InferenceContext], StateSpaceModel]`` (filters/base.py:47-58)
        if callable(model) and not hasattr(model, "hidden"):
            self.model = None
            self.model_builder = model
        else:
            self.model = model
            self.model_builder = None
        self.record_states = record_states
        self.record_intermediary = record_intermediary
        self.nan_strategy = nan_strategy
        self.batch_shape = tuple(batch_shape)

    def initialize_model(self, context) -> "BaseFilter":
        """Build (or rebuild) the model from the inference context via the
        model builder; returns a new filter (pure version of reference
        filters/base.py:120-138)."""
        if self.model_builder is None:
            raise ValueError("filter was not constructed with a model builder")
        with context.no_prior_verification():
            model = self.model_builder(context)
        return self.replace(model=model)

    def step(self, key, y, state, first_step: bool = False):
        """One jit-compiled filter move (the per-observation hot path of the
        sequential inference algorithms)."""
        return _jitted_single_step(self, key, jnp.asarray(y), state, first_step)

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)

        def flatten(f):
            return (f.model,), tuple(getattr(f, n) for n in cls._config_fields)

        def unflatten(aux, children):
            obj = object.__new__(cls)
            obj.model = children[0]
            for n, v in zip(cls._config_fields, aux):
                setattr(obj, n, v)
            return obj

        register_pytree_node(cls, flatten, unflatten)

    # -- functional config update -------------------------------------------
    def replace(self, **kwargs) -> "BaseFilter":
        """New filter with the given attributes replaced."""
        obj = object.__new__(type(self))
        obj.model = kwargs.pop("model", self.model)
        for n in self._config_fields:
            setattr(obj, n, kwargs.pop(n, getattr(self, n)))
        if kwargs:
            raise TypeError(f"unknown fields: {sorted(kwargs)}")
        return obj

    def set_batch_shape(self, batch_shape) -> "BaseFilter":
        """Vectorize over ``batch_shape`` parallel lanes (pure version of
        reference filters/base.py:93-119)."""
        return self.replace(batch_shape=tuple(batch_shape))

    # -- abstract ------------------------------------------------------------
    def initialize(self, key) -> ParticleFilterCorrection:
        raise NotImplementedError

    def predict(self, key, state) -> ParticleFilterPrediction:
        raise NotImplementedError

    def correct(self, key, y, prediction) -> ParticleFilterCorrection:
        raise NotImplementedError

    # -- single observation step ---------------------------------------------
    def filter(
        self, key, y, state, first_step: bool = False, return_intermediaries: bool = False
    ) -> ParticleFilterCorrection:
        """One filter move (reference filters/base.py:188-221): predict,
        ``observe_every_step - 1`` uncorrected sub-steps (0 on the very first
        observation, whose initial time is already aligned), then correct — or
        propagate-only when the observation is entirely NaN.

        ``return_intermediaries`` additionally returns the sub-step states
        stacked as ``(n_sub, ...)`` history leaves (the reference's
        ``record_intermediary_states``, base.py:206-208)."""
        oes = self.model.observe_every_step
        n_sub = 0 if first_step else oes - 1

        keys = jax.random.split(key, n_sub + 2)
        prediction = self.predict(keys[0], state)
        inters = []
        # sub-steps only advance the hidden state: pure propagation leaves
        # the weights (and hence the normalized weights, the ESS gate and
        # the ancestry) untouched, so re-deriving them per sub-step — as
        # the reference's create_state/predict chain does,
        # filters/base.py:204-210 — is redundant recomputation, not
        # different math.
        if n_sub and not return_intermediaries:
            x_new = self._propagate_substeps(keys[1], prediction.x, n_sub)
            prediction = prediction._replace(x=x_new)
        else:
            for i in range(n_sub):
                x_new = self.model.hidden.propagate(keys[1 + i], prediction.x)
                prediction = prediction._replace(x=x_new)
                if return_intermediaries:
                    inters.append(
                        (x_new.time_index, x_new.value, prediction.log_weights, prediction.indices)
                    )

        k_correct = keys[-1]
        y = jnp.asarray(y)

        if self.nan_strategy == "impute":
            y = self._impute(k_correct, y, prediction)

        all_nan = jnp.isnan(y).all()
        correction = jax.lax.cond(
            all_nan,
            lambda k: prediction.create_state_from_prediction(
                k, self.model, compute_moments=getattr(self, "record_moments", True)
            ),
            lambda k: self.correct(k, y, prediction),
            k_correct,
        )
        if return_intermediaries:
            inter = tuple(jnp.stack(parts) for parts in zip(*inters)) if inters else None
            return correction, inter
        return correction

    def _propagate_substeps(self, key, x, n_sub: int):
        """Hook for the sub-step block (overridable by filter subclasses;
        XLA already fuses the elementwise sub-step chain — see PERF.md
        "Measured out")."""
        return self.model.hidden.propagate_substeps(key, x, n_sub)

    def _impute(self, key, y, prediction) -> jax.Array:
        """Fill NaN observation components with the weighted predicted
        observation mean (leaves fully-observed steps untouched)."""
        k_prop, _ = jax.random.split(key)
        x_new = self.model.hidden.propagate(k_prop, prediction.get_timeseries_state())
        obs_mean = self.model.build_density(x_new).mean  # (N, *batch, *event_y)
        w = prediction.normalized_weights
        w = w.reshape(w.shape + (1,) * (obs_mean.ndim - w.ndim))
        pooled = jnp.sum(w * obs_mean, axis=0)  # (*batch, *event_y)
        return jnp.where(jnp.isnan(y), pooled, y)

    # -- full pass ------------------------------------------------------------
    def batch_filter(
        self,
        key,
        y,
        initial_state: Optional[ParticleFilterCorrection] = None,
        use_jit: bool = True,
        unroll: int = 1,
    ) -> FilterResult:
        """Filter a whole observation sequence ``y`` (time axis leading) in one
        compiled ``lax.scan`` (replaces reference base.py:140-158).

        ``unroll`` unrolls the scan body (static): on TPU, ``unroll=4`` cuts
        per-step launch overhead by ~35%% at N=1e6 (longer compiles — keep
        moderate for long sequences)."""
        if use_jit:
            if initial_state is None:
                return _jitted_batch_filter_noinit(self, key, jnp.asarray(y), unroll)
            return _jitted_batch_filter(self, key, jnp.asarray(y), initial_state, unroll)
        return _batch_filter_impl(self, key, jnp.asarray(y), initial_state, unroll)

    def batch_filter_masked(self, key, y_padded, n_valid) -> FilterResult:
        """Filter ``y_padded[:n_valid]`` where ``n_valid`` is a TRACED scalar
        and ``y_padded`` has a fixed (bucketed) length: one compile serves
        every history length up to the bucket (see :func:`pad_observations`).
        Steps past ``n_valid`` pass through untouched; the returned result
        carries the state and lane log-likelihood after step ``n_valid``.
        Moment/state recording is not supported here (this is the
        rejuvenation re-filter fast path)."""
        if self.record_states or self.record_intermediary:
            raise ValueError("batch_filter_masked cannot record states")
        return _jitted_masked_batch_filter(
            self.replace(record_states=False), key, jnp.asarray(y_padded), jnp.int32(n_valid)
        )


def pad_observations(y: jax.Array, bucket: int = None):
    """Pad ``y``'s time axis to the next power of two (or ``bucket``).

    With :meth:`BaseFilter.batch_filter_masked`, growing histories (SMC2's
    rejuvenation re-filters) compile once per bucket instead of once per
    length — the reference pays a Python re-loop instead (mh.py:74), a JAX
    rebuild would pay a full XLA recompile per rejuvenation without this.
    Returns ``(y_padded, n_valid)``.
    """
    t = y.shape[0]
    if bucket is None:
        bucket = 1 << max(t - 1, 0).bit_length()
    if bucket < t:
        raise ValueError(f"bucket {bucket} shorter than the sequence {t}")
    if isinstance(y, np.ndarray):
        # host path: numpy pad + one device_put — a device-side concatenate
        # would compile a fresh XLA program for every distinct history length
        # (measured ~0.8 s per length on the rejuvenation path)
        out = np.zeros((bucket,) + y.shape[1:], y.dtype)
        out[:t] = y
        return jnp.asarray(out), t
    pad = jnp.zeros((bucket - t,) + y.shape[1:], y.dtype)
    return jnp.concatenate([y, pad], axis=0), t


def _step_outputs(filt: BaseFilter, c: ParticleFilterCorrection):
    out = (c.log_likelihood, c.mean, c.variance)
    if filt.record_states is True:  # bool full recording; int k uses a rolling buffer
        out += _history_leaves(c)
    return out


def _bounded_k(filt: BaseFilter):
    rs = filt.record_states
    if isinstance(rs, bool) or not isinstance(rs, int):
        return None
    return rs


def _history_leaves(c: ParticleFilterCorrection):
    return (c.x.time_index, c.x.value, c.log_weights, c.prev_indices)


def _batch_filter_impl(filt: BaseFilter, key, y, initial_state, unroll: int = 1) -> FilterResult:
    k_init, k_first, k_scan = jax.random.split(key, 3)
    state0 = filt.initialize(k_init) if initial_state is None else initial_state

    n_steps = y.shape[0]
    if n_steps == 0:
        raise ValueError("empty observation sequence")

    # first observation outside the scan: its sub-step count differs when
    # observe_every_step > 1 (the initial time index is already aligned).
    state1 = filt.filter(k_first, y[0], state0, first_step=True)
    first_out = _step_outputs(filt, state1)

    oes = filt.model.observe_every_step
    record_inter = (
        filt.record_states is True
        and getattr(filt, "record_intermediary", False)
        and oes > 1
        and n_steps > 1
    )

    k_bound = _bounded_k(filt)
    if k_bound is not None:
        # rolling last-k history in the scan carry (the reference's
        # ``record_states=int`` maxlen deque, container.py:10-18) — bounded
        # memory for fixed-lag smoothing over long sequences.
        total = n_steps + 1
        if k_bound < 2 or k_bound > total:
            raise ValueError(
                f"record_states={k_bound} must be in [2, num_observations + 1]"
            )
        if getattr(filt, "record_intermediary", False):
            raise ValueError("bounded record_states cannot record intermediaries")

        leaves0 = tuple(jnp.asarray(l) for l in _history_leaves(state0))
        buf = tuple(jnp.zeros((k_bound,) + l.shape, l.dtype).at[0].set(l) for l in leaves0)
        buf = tuple(
            b.at[1 % k_bound].set(jnp.asarray(l))
            for b, l in zip(buf, _history_leaves(state1))
        )

        def step_bounded(carry, inp):
            state, bb, g = carry
            kk, y_t = inp
            new = filt.filter(kk, y_t, state)
            bb = tuple(
                b.at[g % k_bound].set(jnp.asarray(l))
                for b, l in zip(bb, _history_leaves(new))
            )
            return (new, bb, g + 1), (new.log_likelihood, new.mean, new.variance)

        keys = jax.random.split(k_scan, n_steps - 1)
        (last_state, buf, _), rest_out = jax.lax.scan(
            step_bounded,
            (state1, buf, jnp.asarray(2, jnp.int32)),
            (keys, y[1:]),
            unroll=unroll,
        )
        shift = total % k_bound  # static: slot of the oldest kept state
        history = FilterHistory(*(jnp.roll(b, -shift, axis=0) for b in buf))
        outs3 = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first_out[:3], rest_out
        )
        step_lls, means, variances = outs3
        return FilterResult(
            log_likelihood=jnp.sum(step_lls, axis=0),
            step_log_likelihoods=step_lls,
            filter_means=means,
            filter_variances=variances,
            latest_state=last_state,
            states=history,
        )

    def step(state, inp):
        k, y_t = inp
        if record_inter:
            new, inter = filt.filter(k, y_t, state, return_intermediaries=True)
            return new, (_step_outputs(filt, new), inter)
        new = filt.filter(k, y_t, state)
        return new, (_step_outputs(filt, new),)

    rest_inter = None
    if n_steps > 1:
        keys = jax.random.split(k_scan, n_steps - 1)
        last_state, rest = jax.lax.scan(step, state1, (keys, y[1:]), unroll=unroll)
        rest_out = rest[0]
        if record_inter:
            rest_inter = rest[1]  # leaves shaped (T-1, n_sub, ...)
        outs = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), first_out, rest_out
        )
    else:
        last_state = state1
        outs = jax.tree_util.tree_map(lambda a: a[None], first_out)

    step_lls, means, variances = outs[:3]
    history = None
    if filt.record_states:
        # prepend the initial (t=0) state: the recorded history spans t=0..T
        # (reference result.py:40 appends init_state), while filter_means spans
        # the T observations only (the reference's extra t=0 row is skipped by
        # its own tests, test_particle.py:105).
        if rest_inter is not None:
            # interleave sub-step states with their corrections: timeline is
            # [init, first correction, (substeps..., correction) x (T-1)]
            rest_corr = tuple(o[1:] for o in outs[3:])  # (T-1, ...) leaves
            first_corr = tuple(o[:1] for o in outs[3:])

            def interleave(inter_leaf, corr_leaf):
                combined = jnp.concatenate(
                    [inter_leaf, corr_leaf[:, None]], axis=1
                )  # (T-1, oes, ...)
                return combined.reshape((-1,) + combined.shape[2:])

            flat = tuple(interleave(i, c) for i, c in zip(rest_inter, rest_corr))
            history = FilterHistory(
                *(
                    jnp.concatenate([jnp.asarray(h0)[None], f0, fl], axis=0)
                    for h0, f0, fl in zip(_history_leaves(state0), first_corr, flat)
                )
            )
        else:
            history = FilterHistory(
                *jax.tree_util.tree_map(
                    lambda h0, hs: jnp.concatenate([jnp.asarray(h0)[None], hs], axis=0),
                    _history_leaves(state0),
                    tuple(outs[3:]),
                )
            )

    return FilterResult(
        log_likelihood=jnp.sum(step_lls, axis=0),
        step_log_likelihoods=step_lls,
        filter_means=means,
        filter_variances=variances,
        latest_state=last_state,
        states=history,
    )


@functools.partial(jax.jit, static_argnums=(4,))
def _jitted_batch_filter(filt, key, y, initial_state, unroll):
    return _batch_filter_impl(filt, key, y, initial_state, unroll)


@functools.partial(jax.jit, static_argnums=(3,))
def _jitted_batch_filter_noinit(filt, key, y, unroll):
    return _batch_filter_impl(filt, key, y, None, unroll)


@functools.partial(jax.jit, static_argnums=(4,))
def _jitted_single_step(filt, key, y, state, first_step):
    return filt.filter(key, y, state, first_step=first_step)


@jax.jit
def _jitted_masked_batch_filter(filt, key, y, n_valid):
    """Filter the padded observation buffer up to the traced ``n_valid``.

    A ``fori_loop`` with a traced trip count runs ONLY the valid steps.  The
    previous design (full-length scan, per-step ``lax.cond`` pass-through)
    priced every padded position at ~half an active step — the carried
    particle cloud flows through the cond either way — which at SMC2's early
    rejuvenations (short history, full bucket) was ~85% of the re-filter
    fire (PERF.md).  The key stream matches the scan version exactly
    (``split(k_scan, n_steps - 1)`` indexed per step), so results are
    bit-identical for any ``n_valid``."""
    k_init, k_first, k_scan = jax.random.split(key, 3)
    state0 = filt.initialize(k_init)
    state1 = filt.filter(k_first, y[0], state0, first_step=True)

    n_steps = y.shape[0]
    if n_steps == 1:
        return FilterResult(
            log_likelihood=state1.log_likelihood,
            step_log_likelihoods=state1.log_likelihood[None],
            filter_means=None,
            filter_variances=None,
            latest_state=state1,
        )

    keys = jax.random.split(k_scan, n_steps - 1)
    step_lls0 = (
        jnp.zeros((n_steps,) + state1.log_likelihood.shape, state1.log_likelihood.dtype)
        .at[0]
        .set(state1.log_likelihood)
    )

    def body(i, carry):
        state, lls = carry
        new = filt.filter(keys[i - 1], y[i], state)
        return new, lls.at[i].set(new.log_likelihood)

    last, step_lls = jax.lax.fori_loop(1, n_valid, body, (state1, step_lls0))
    return FilterResult(
        log_likelihood=jnp.sum(step_lls, axis=0),
        step_log_likelihoods=step_lls,
        filter_means=None,
        filter_variances=None,
        latest_state=last,
    )
