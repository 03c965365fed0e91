"""Elo computation with uncertainty — equivalent of cpp/core/elo.{cpp,h}.

Used by match and gatekeeper tooling to estimate strength differences from
game records, including approximate standard deviations via the observed
Fisher information (the reference computes Elo with covariance for its
match summaries).
"""

from __future__ import annotations

import math

ELO_PER_NAT = 400.0 / math.log(10.0)


def win_prob_of_elo_diff(elo_diff: float) -> float:
    """P(A beats B) given elo(A) - elo(B)."""
    return 1.0 / (1.0 + 10.0 ** (-elo_diff / 400.0))


def elo_diff_of_win_prob(p: float) -> float:
    p = min(max(p, 1e-9), 1.0 - 1e-9)
    return -400.0 * math.log10(1.0 / p - 1.0)


def estimate_elo(wins: float, losses: float, draws: float = 0.0
                 ) -> tuple[float, float]:
    """(elo_diff, stdev) of player A vs B from a match record.

    Draws count half a win each way. Stdev from the Fisher information of
    the Bradley-Terry likelihood at the MLE.
    """
    w = wins + 0.5 * draws
    l = losses + 0.5 * draws
    n = w + l
    if n <= 0:
        return 0.0, float("inf")
    p = w / n
    elo = elo_diff_of_win_prob(p)
    # var(p_hat) = p(1-p)/n; delta method through the logistic link
    p_c = min(max(p, 1.0 / (n + 1)), n / (n + 1))
    dp = math.sqrt(p_c * (1.0 - p_c) / n)
    d_elo_dp = ELO_PER_NAT / (p_c * (1.0 - p_c))
    return elo, d_elo_dp * dp


def log_likelihood_of_record(elo_diff: float, wins: float, losses: float,
                             draws: float = 0.0) -> float:
    p = win_prob_of_elo_diff(elo_diff)
    w = wins + 0.5 * draws
    l = losses + 0.5 * draws
    return w * math.log(max(p, 1e-300)) + l * math.log(max(1 - p, 1e-300))
