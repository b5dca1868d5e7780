"""Golden-value tests for the in-house survival statistics.

VERDICT r4 item 5: the C-index / log-rank / KM implementations
(statistics/survival_util.py) were property-tested but never numerically
pinned.  This module pins them on a fixed tie-heavy, censoring-heavy cohort
against values computed by an INDEPENDENT brute-force oracle written
directly from the published definitions with lifelines' conventions
(reference src/stamp/statistics/survival.py:24-181 delegates to lifelines;
lifelines itself is not installable in this environment):

* C-index — explicit ordered-pair enumeration in exact rational arithmetic
  (``fractions.Fraction``): tied-time both-event pairs count (credit 1 on
  tied predictions, else ½); tied-time one-event pairs count (the event
  subject must have the lower predicted survival); the answer on this
  cohort is exactly 323/344.
* log-rank — per-event-time 2×2 table accumulation (O/E/V), χ² with 1 dof.
* Kaplan-Meier — product over event times at fixed probe times.

The brute-force oracle runs in the test AND the expected numbers are ALSO
frozen as literals, so the two implementations cannot drift together
silently.  Tie handling in the C-index is the classic silent divergence
this protects against.
"""

from fractions import Fraction

import numpy as np
import pytest
from scipy import stats as st

from stamp_tpu.statistics.survival_util import (
    KaplanMeier,
    concordance_index,
    logrank_test,
)

# Fixed cohort: 24 subjects, 8 distinct times all carrying ties, 10 censored
# (42%), predictions with many exact ties across event/censor boundaries.
TIMES = np.array(
    [5, 5, 5, 8, 8, 8, 8, 12, 12, 15, 15, 15, 20, 20, 25, 25, 25, 30, 30,
     34, 34, 34, 40, 40],
    float,
)
EVENTS = np.array(
    [1, 1, 0, 1, 0, 1, 0, 1, 1, 0, 1, 0, 1, 1, 0, 0, 1, 1, 0, 1, 1, 0, 0, 0],
    bool,
)
SCORES = np.array(
    [10, 12, 10, 14, 10, 14, 18, 16, 16, 20, 18, 22, 24, 24, 26, 20, 24, 28,
     30, 30, 28, 32, 36, 36],
    float,
)
GROUP_A = np.arange(24) % 2 == 1  # alternating split for the log-rank test


def _brute_cindex(t, e, s) -> Fraction:
    num, den, half = Fraction(0), Fraction(0), Fraction(1, 2)
    n = len(t)
    for i in range(n):
        for j in range(i + 1, n):
            ti, tj, ei, ej, si, sj = t[i], t[j], e[i], e[j], s[i], s[j]
            if ti == tj:
                if ei and ej:
                    den += 1
                    num += 1 if si == sj else half
                elif ei != ej:
                    den += 1
                    ev_s, cen_s = (si, sj) if ei else (sj, si)
                    num += (
                        1 if ev_s < cen_s else (half if ev_s == cen_s else 0)
                    )
            else:
                if ti > tj:
                    ti, tj, ei, ej, si, sj = tj, ti, ej, ei, sj, si
                if ei:
                    den += 1
                    num += 1 if si < sj else (half if si == sj else 0)
    return num / den


def _brute_logrank(ta, ea, tb, eb) -> tuple[float, float]:
    obs = exp = var = 0.0
    for tau in sorted(set(np.concatenate([ta[ea], tb[eb]]))):
        na, nb = float((ta >= tau).sum()), float((tb >= tau).sum())
        da = float(((ta == tau) & ea).sum())
        db = float(((tb == tau) & eb).sum())
        n, d = na + nb, da + db
        if n <= 1:
            continue
        obs += da
        exp += d * na / n
        var += d * (na / n) * (nb / n) * (n - d) / (n - 1)
    chi2 = (obs - exp) ** 2 / var
    return chi2, float(st.chi2.sf(chi2, df=1))


def _brute_km_at(t, e, probe: float) -> float:
    s = 1.0
    for tau in sorted(set(np.asarray(t)[np.asarray(e)])):
        if tau <= probe:
            n_r = (t >= tau).sum()
            s *= 1.0 - ((t == tau) & e).sum() / n_r
    return s


def test_cindex_matches_brute_force_and_golden():
    got = concordance_index(TIMES, SCORES, EVENTS)
    brute = _brute_cindex(TIMES, EVENTS, SCORES)
    assert brute == Fraction(323, 344)  # frozen exact golden
    assert got == pytest.approx(float(brute), abs=1e-12)
    assert got == pytest.approx(0.938953488372093, abs=1e-12)


def test_cindex_tiny_hand_case():
    """4 subjects, hand-countable: pairs (see docstring of _brute_cindex)."""
    t = np.array([1.0, 2.0, 2.0, 3.0])
    e = np.array([True, True, False, False])
    s = np.array([1.0, 3.0, 2.0, 2.0])
    # usable pairs: (0,1) 1✓, (0,2) 1✓, (0,3) 1✓ (earlier event, lower score);
    # (1,2) tied time, one event: event has HIGHER score → 0;
    # (1,3) t1<t3, event: s1 > s3 → 0;  (2,3) censored earlier → not usable.
    assert concordance_index(t, s, e) == pytest.approx(3 / 5)
    assert _brute_cindex(t, e, s) == Fraction(3, 5)


def test_logrank_matches_brute_force_and_golden():
    ta, ea = TIMES[GROUP_A], EVENTS[GROUP_A]
    tb, eb = TIMES[~GROUP_A], EVENTS[~GROUP_A]
    got = logrank_test(ta, tb, ea, eb)
    chi2, p = _brute_logrank(ta, ea, tb, eb)
    assert chi2 == pytest.approx(0.002647947095978632, abs=1e-12)  # frozen
    assert p == pytest.approx(0.9589604034673544, abs=1e-12)  # frozen
    assert got.test_statistic == pytest.approx(chi2, abs=1e-10)
    assert got.p_value == pytest.approx(p, abs=1e-10)


def test_logrank_separated_groups_is_significant():
    """Fully separated groups: the χ² must be large and p tiny (sanity that
    the statistic moves in the right direction on this cohort size)."""
    ta = np.array([1.0, 2, 3, 4, 5, 6, 7, 8])
    tb = ta + 100.0
    res = logrank_test(ta, tb, np.ones(8, bool), np.ones(8, bool))
    assert res.test_statistic > 10
    assert res.p_value < 1e-3


KM_GOLDEN_ALL = {  # probe time → S(t), frozen from the brute-force oracle
    0.0: 1.0,
    5.0: 0.9166666666666666,
    10.0: 0.8293650793650793,
    20.0: 0.5691721132897602,
    30.0: 0.4390756302521008,
    40.0: 0.2634453781512605,
}


def test_km_matches_brute_force_and_golden():
    km = KaplanMeier.fit(TIMES, EVENTS)
    for probe, want in KM_GOLDEN_ALL.items():
        brute = _brute_km_at(TIMES, EVENTS, probe)
        assert brute == pytest.approx(want, abs=1e-12), probe
        idx = np.searchsorted(km.timeline, probe, side="right") - 1
        assert km.survival[idx] == pytest.approx(want, abs=1e-12), probe


def test_km_at_risk_counts():
    km = KaplanMeier.fit(TIMES, EVENTS)
    # just before t=15, subjects with t >= 15 are at risk: 24 - 9 = 15
    assert km.at_risk_at(np.array([15.0]))[0] == 15
    assert km.at_risk_at(np.array([0.0]))[0] == 24
    assert km.at_risk_at(np.array([40.0]))[0] == 2
