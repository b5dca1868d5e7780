"""Cox proportional-hazards partial-likelihood losses in JAX.

Behavioral port of the reference's torchsurv-derived implementation
(src/stamp/modeling/models/cox.py:20-270) plus the slide-level Breslow variant
(src/stamp/modeling/models/__init__.py:626-659).

Design notes (TPU):
  * Everything is static-shape and jit-safe: sorting via ``jnp.argsort``,
    risk-set log-denominators via reversed ``cumlogsumexp``, Efron tie
    correction expressed segment-wise instead of the reference's Python loops.
  * When there are no ties, the Efron formula reduces *exactly* to the plain
    Cox partial likelihood, so a single code path covers the reference's
    no-ties/efron dispatch without data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cumlogsumexp_rev(x: jax.Array) -> jax.Array:
    """log(sum_{j>=i} exp(x_j)) for each i."""
    return jnp.flip(jax.lax.cumlogsumexp(jnp.flip(x)))


def neg_partial_log_likelihood(
    log_hz: jax.Array,
    time: jax.Array,
    event: jax.Array,
    *,
    ties_method: str = "efron",
    reduction: str = "mean",
) -> jax.Array:
    """Negative Cox partial log-likelihood with Efron (default) or Breslow ties.

    Args:
        log_hz: [N] log relative hazards.
        time:   [N] event or censoring times.
        event:  [N] 1 = event, 0 = censored.

    NaN-labelled samples (missing time or status) are excluded.
    """
    log_hz = log_hz.reshape(-1)
    time = time.reshape(-1)
    event = event.reshape(-1)
    n = log_hz.shape[0]

    valid = ~(jnp.isnan(time) | jnp.isnan(event))
    event_b = jnp.where(valid, event > 0, False)
    # Push invalid samples to the end of the sort & out of every risk set.
    big = jnp.float32(3.4e38)
    time_f = jnp.where(valid, time, big)

    order = jnp.argsort(time_f, stable=True)
    t_s = time_f[order]
    lh_s = jnp.where(valid, log_hz, -jnp.inf)[order]
    ev_s = event_b[order]

    # Breslow/no-ties risk-set denominator: log sum_{j: t_j >= t_i} exp(lh_j),
    # evaluated at the *first* index of each tied-time group.
    log_denom = _cumlogsumexp_rev(lh_s)

    # --- tie groups ---
    is_new_group = jnp.concatenate(
        [jnp.ones((1,), bool), t_s[1:] != t_s[:-1]]
    )
    group_id = jnp.cumsum(is_new_group) - 1  # [N] 0-based group index

    # Denominator at group start (risk set of the group's shared time).
    # first index of each group: scatter-min over group ids
    first_idx = jnp.full((n,), n - 1, dtype=jnp.int32).at[group_id].min(
        jnp.arange(n, dtype=jnp.int32)
    )
    log_denom_group = log_denom[first_idx][group_id]  # [N]

    if ties_method == "breslow":
        pll = lh_s - log_denom_group
    elif ties_method == "efron":
        # Events per group and log-sum-exp of tied event hazards per group.
        ev_f = ev_s.astype(lh_s.dtype)
        m_per_group = jnp.zeros((n,), lh_s.dtype).at[group_id].add(ev_f)
        m_g = m_per_group[group_id]  # [N] events in own group
        # logsumexp of event hazards per group (stable via group max)
        ev_lh = jnp.where(ev_s, lh_s, -jnp.inf)
        grp_max = jnp.full((n,), -jnp.inf, lh_s.dtype).at[group_id].max(ev_lh)
        grp_max_safe = jnp.where(jnp.isfinite(grp_max), grp_max, 0.0)
        exp_shift = jnp.where(ev_s, jnp.exp(lh_s - grp_max_safe[group_id]), 0.0)
        grp_sum = jnp.zeros((n,), lh_s.dtype).at[group_id].add(exp_shift)
        log_tied = jnp.where(
            grp_sum > 0, jnp.log(jnp.maximum(grp_sum, 1e-38)) + grp_max_safe, -jnp.inf
        )
        log_tied_g = log_tied[group_id]  # [N]

        # Rank of each event within its tie group (0-based, events only).
        ev_cum = jnp.cumsum(ev_f)
        ev_before_group = jnp.concatenate([jnp.zeros((1,), lh_s.dtype), ev_cum])[
            first_idx
        ][group_id]
        r = ev_cum - 1.0 - ev_before_group  # rank among events in group

        # log(denom - r/m * tied) = a + log1p(-(r/m)·exp(b-a))
        frac = jnp.where(m_g > 0, r / jnp.maximum(m_g, 1.0), 0.0)
        # Guard -inf − -inf → nan (groups of invalid rows); those rows are
        # masked out below, but a nan here would poison gradients.
        both_finite = jnp.isfinite(log_tied_g) & jnp.isfinite(log_denom_group)
        log_ratio = jnp.where(
            both_finite,
            jnp.where(both_finite, log_tied_g, 0.0)
            - jnp.where(both_finite, log_denom_group, 0.0),
            -jnp.inf,
        )
        correction = frac * jnp.exp(jnp.minimum(log_ratio, 0.0))
        log_denom_efron = log_denom_group + jnp.log1p(
            -jnp.minimum(correction, 1.0 - 1e-7)
        )
        pll = lh_s - log_denom_efron
    else:
        raise ValueError(
            f'Ties method {ties_method} should be one of ["efron", "breslow"]'
        )

    pll = jnp.where(ev_s, pll, jnp.nan)
    n_events = jnp.sum(ev_s)

    if reduction.lower() == "mean":
        loss = -jnp.nansum(pll) / jnp.maximum(n_events, 1)
    elif reduction.lower() == "sum":
        loss = -jnp.nansum(pll)
    else:
        raise ValueError(
            f"Reduction {reduction} is not implemented yet, should be one of "
            "['mean', 'sum']."
        )
    # No events → zero loss, matching reference cox.py:221-226.
    return jnp.where(n_events > 0, loss, 0.0)


def cox_loss_breslow(
    scores: jax.Array, times: jax.Array, events: jax.Array
) -> jax.Array:
    """Breslow negative partial log-likelihood, max-shift stabilized.

    Port of the slide-level ``LitSurvivalBase.cox_loss``
    (reference models/__init__.py:626-659): risk set j ∈ R_i iff t_j >= t_i,
    mean over events; zero when no events.
    """
    scores = scores.reshape(-1)
    events_b = events.reshape(-1) > 0
    times = times.reshape(-1)

    valid = ~(jnp.isnan(times) | jnp.isnan(events.reshape(-1)))
    events_b = events_b & valid

    max_scores = jnp.max(jnp.where(valid, scores, -jnp.inf))
    max_scores = jnp.where(jnp.isfinite(max_scores), max_scores, 0.0)
    exp_s = jnp.where(valid, jnp.exp(scores - max_scores), 0.0)

    # risk_mask[i, j] = t_i <= t_j (row i = event i's risk set)
    risk_mask = times[:, None] <= times[None, :]
    risk_mask = risk_mask & valid[None, :]
    lse = jnp.log(jnp.maximum(risk_mask @ exp_s, 1e-38)) + max_scores

    loglik = jnp.where(events_b, scores - lse, jnp.nan)
    n_events = jnp.sum(events_b)
    loss = -jnp.nansum(loglik) / jnp.maximum(n_events, 1)
    return jnp.where(n_events > 0, loss, 0.0)
