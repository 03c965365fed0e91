"""Search parameters — mirror of cpp/search/searchparams.h:11-177.

Defaults match SearchParams::SearchParams() (searchparams.cpp:13-90), which
the reference keeps deterministic (no noise) for tests; selfplay configs
override (cpp/configs/training/selfplay1.cfg). The device-side search reads
a SearchParamsArr NamedTuple of scalars so one compiled search serves any
parameter setting (and mixed settings across a batch where meaningful).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SearchParams:
    # utility
    win_loss_utility_factor: float = 1.0
    static_score_utility_factor: float = 0.3
    dynamic_score_utility_factor: float = 0.0
    dynamic_score_center_zero_weight: float = 0.0
    dynamic_score_center_scale: float = 1.0
    no_result_utility_for_white: float = 0.0
    draw_equivalent_wins_for_white: float = 0.5
    # puct
    cpuct_exploration: float = 1.0
    cpuct_exploration_log: float = 0.0
    cpuct_exploration_base: float = 500.0
    cpuct_utility_stdev_prior: float = 0.25
    cpuct_utility_stdev_prior_weight: float = 1.0
    cpuct_utility_stdev_scale: float = 0.0
    fpu_reduction_max: float = 0.2
    fpu_loss_prop: float = 0.0
    fpu_parent_weight: float = 0.0
    value_weight_exponent: float = 0.5
    # uncertainty weighting (searchparams.h:40-49)
    use_uncertainty: bool = False
    uncertainty_coeff: float = 0.2
    uncertainty_exponent: float = 1.0
    uncertainty_max_weight: float = 8.0
    # root
    root_noise_enabled: bool = False
    root_dirichlet_noise_total_concentration: float = 10.83
    root_dirichlet_noise_weight: float = 0.25
    root_policy_temperature: float = 1.0
    root_policy_temperature_early: float = 1.0
    root_fpu_reduction_max: float = 0.2
    root_fpu_loss_prop: float = 0.0
    # move selection
    chosen_move_temperature: float = 0.0
    chosen_move_temperature_early: float = 0.0
    chosen_move_temperature_halflife: float = 19.0
    chosen_move_subtract: float = 0.0
    chosen_move_prune: float = 1.0
    use_lcb_for_selection: bool = False
    lcb_stdevs: float = 4.0
    min_visit_prop_for_lcb: float = 0.05
    # graph search (MCGS transpositions, searchparams.h:52-55)
    use_graph_search: bool = True
    graph_search_rep_bound: int = 11   # searchparams.cpp:42
    # subtree value bias (searchparams.h:115-118; selfplay1.cfg:180)
    subtree_value_bias_factor: float = 0.0
    subtree_value_bias_weight_exponent: float = 0.5
    # misc
    nn_policy_temperature: float = 1.0
    # optimistic-policy blending (policyOptimism/rootPolicyOptimism,
    # searchparams.cpp:32,55; blend trtbackend.cpp:2082)
    policy_optimism: float = 0.0
    root_policy_optimism: float = 0.0
    # analysis root-widening (wideRootNoise, searchparams.cpp:71; the
    # policy-smoothing pow of searchexplorehelpers.cpp:90 — the per-visit
    # random utility bonus dissolves in the lockstep batch)
    wide_root_noise: float = 0.0
    # endgame shaping: discourage pointless territory fills / encourage
    # dame-filling (rootEndingBonusPoints, searchparams.cpp:66; standard
    # gtp/match presets use 0.5, searchparams.cpp:288)
    root_ending_bonus_points: float = 0.0
    # forbid root moves in either side's pass-alive area after the
    # opponent passed four times in a row (isAllowedRootMove,
    # searchhelpers.cpp:311-341)
    root_prune_useless_moves: bool = False
    # prune symmetry-duplicate root moves on symmetric positions
    # (rootSymmetryPruning, search.cpp:732 + markDuplicateMoveLocs,
    # nninputs.cpp:675-760)
    root_symmetry_pruning: bool = False
    # ---- host-side time-manager knobs (searchparams.h:139-156,
    # Search::recomputeSearchTimeLimit) — consumed between chunks by the
    # SearchDriver, never traced, so they are not in SearchParamsArr ----
    overallocate_time_factor: float = 1.0
    midgame_time_factor: float = 1.0
    midgame_turn_peak_time: float = 130.0
    endgame_turn_time_decay: float = 100.0
    obvious_moves_time_factor: float = 1.0
    obvious_moves_policy_entropy_tolerance: float = 0.30
    obvious_moves_policy_surprise_tolerance: float = 0.15
    futile_visits_threshold: float = 0.0
    lag_buffer: float = 1.0
    playout_doubling_advantage: float = 0.0
    conservative_pass: bool = False
    # per-eval random dihedral symmetry (nnRandomize, nneval.h:169-179)
    nn_random_symmetry: bool = False
    # symmetries averaged at the root eval (rootNumSymmetriesToSample,
    # searchparams.h:76); static in the compiled search
    root_num_symmetries: int = 1
    # avoid-repeated-shapes white-utility penalty
    # (avoidRepeatedPatternUtility, searchparams.h:119); host-side — the
    # table it parameterizes is built between searches (search/patternbonus)
    avoid_repeated_pattern_utility: float = 0.0

    @staticmethod
    def for_selfplay() -> "SearchParams":
        """Selfplay-flavored settings per cpp/configs/training/selfplay1.cfg."""
        return SearchParams(
            static_score_utility_factor=0.1,
            dynamic_score_utility_factor=0.3,
            dynamic_score_center_zero_weight=0.2,
            dynamic_score_center_scale=0.75,
            cpuct_exploration=1.0,
            cpuct_exploration_log=0.45,
            root_noise_enabled=True,
            root_policy_temperature=1.4,
            root_policy_temperature_early=1.8,
            root_fpu_reduction_max=0.1,
            subtree_value_bias_factor=0.30,
            chosen_move_temperature=0.1,
            chosen_move_temperature_early=0.75,
            chosen_move_temperature_halflife=19.0,
            use_uncertainty=True,
            value_weight_exponent=0.25,
            root_ending_bonus_points=0.5,
            root_prune_useless_moves=True,
        )

    def to_arr(self) -> "SearchParamsArr":
        f = jnp.float32
        return SearchParamsArr(
            win_loss_utility_factor=f(self.win_loss_utility_factor),
            static_score_utility_factor=f(self.static_score_utility_factor),
            dynamic_score_utility_factor=f(self.dynamic_score_utility_factor),
            dynamic_score_center_zero_weight=f(self.dynamic_score_center_zero_weight),
            dynamic_score_center_scale=f(self.dynamic_score_center_scale),
            no_result_utility_for_white=f(self.no_result_utility_for_white),
            draw_equivalent_wins_for_white=f(self.draw_equivalent_wins_for_white),
            cpuct_exploration=f(self.cpuct_exploration),
            cpuct_exploration_log=f(self.cpuct_exploration_log),
            cpuct_exploration_base=f(self.cpuct_exploration_base),
            cpuct_utility_stdev_prior=f(self.cpuct_utility_stdev_prior),
            cpuct_utility_stdev_prior_weight=f(self.cpuct_utility_stdev_prior_weight),
            cpuct_utility_stdev_scale=f(self.cpuct_utility_stdev_scale),
            fpu_reduction_max=f(self.fpu_reduction_max),
            fpu_loss_prop=f(self.fpu_loss_prop),
            fpu_parent_weight=f(self.fpu_parent_weight),
            value_weight_exponent=f(self.value_weight_exponent),
            use_uncertainty=jnp.bool_(self.use_uncertainty),
            uncertainty_coeff=f(self.uncertainty_coeff),
            uncertainty_exponent=f(self.uncertainty_exponent),
            uncertainty_max_weight=f(self.uncertainty_max_weight),
            root_noise_enabled=jnp.bool_(self.root_noise_enabled),
            root_dirichlet_noise_total_concentration=f(self.root_dirichlet_noise_total_concentration),
            root_dirichlet_noise_weight=f(self.root_dirichlet_noise_weight),
            root_policy_temperature=f(self.root_policy_temperature),
            root_policy_temperature_early=f(self.root_policy_temperature_early),
            root_fpu_reduction_max=f(self.root_fpu_reduction_max),
            root_fpu_loss_prop=f(self.root_fpu_loss_prop),
            chosen_move_temperature=f(self.chosen_move_temperature),
            chosen_move_temperature_early=f(self.chosen_move_temperature_early),
            chosen_move_temperature_halflife=f(self.chosen_move_temperature_halflife),
            use_lcb_for_selection=jnp.bool_(self.use_lcb_for_selection),
            lcb_stdevs=f(self.lcb_stdevs),
            min_visit_prop_for_lcb=f(self.min_visit_prop_for_lcb),
            use_graph_search=jnp.bool_(self.use_graph_search),
            graph_search_rep_bound=jnp.int32(self.graph_search_rep_bound),
            subtree_value_bias_factor=f(self.subtree_value_bias_factor),
            subtree_value_bias_weight_exponent=f(
                self.subtree_value_bias_weight_exponent),
            nn_policy_temperature=f(self.nn_policy_temperature),
            policy_optimism=f(self.policy_optimism),
            root_policy_optimism=f(self.root_policy_optimism),
            wide_root_noise=f(self.wide_root_noise),
            root_ending_bonus_points=f(self.root_ending_bonus_points),
            root_prune_useless_moves=jnp.bool_(
                self.root_prune_useless_moves),
            root_symmetry_pruning=jnp.bool_(self.root_symmetry_pruning),
            playout_doubling_advantage=f(self.playout_doubling_advantage),
            conservative_pass=jnp.bool_(self.conservative_pass),
            nn_random_symmetry=jnp.bool_(self.nn_random_symmetry),
        )


class SearchParamsArr(NamedTuple):
    win_loss_utility_factor: jax.Array
    static_score_utility_factor: jax.Array
    dynamic_score_utility_factor: jax.Array
    dynamic_score_center_zero_weight: jax.Array
    dynamic_score_center_scale: jax.Array
    no_result_utility_for_white: jax.Array
    draw_equivalent_wins_for_white: jax.Array
    cpuct_exploration: jax.Array
    cpuct_exploration_log: jax.Array
    cpuct_exploration_base: jax.Array
    cpuct_utility_stdev_prior: jax.Array
    cpuct_utility_stdev_prior_weight: jax.Array
    cpuct_utility_stdev_scale: jax.Array
    fpu_reduction_max: jax.Array
    fpu_loss_prop: jax.Array
    fpu_parent_weight: jax.Array
    value_weight_exponent: jax.Array
    use_uncertainty: jax.Array
    uncertainty_coeff: jax.Array
    uncertainty_exponent: jax.Array
    uncertainty_max_weight: jax.Array
    root_noise_enabled: jax.Array
    root_dirichlet_noise_total_concentration: jax.Array
    root_dirichlet_noise_weight: jax.Array
    root_policy_temperature: jax.Array
    root_policy_temperature_early: jax.Array
    root_fpu_reduction_max: jax.Array
    root_fpu_loss_prop: jax.Array
    chosen_move_temperature: jax.Array
    chosen_move_temperature_early: jax.Array
    chosen_move_temperature_halflife: jax.Array
    use_lcb_for_selection: jax.Array
    lcb_stdevs: jax.Array
    min_visit_prop_for_lcb: jax.Array
    use_graph_search: jax.Array
    graph_search_rep_bound: jax.Array
    subtree_value_bias_factor: jax.Array
    subtree_value_bias_weight_exponent: jax.Array
    nn_policy_temperature: jax.Array
    policy_optimism: jax.Array
    root_policy_optimism: jax.Array
    wide_root_noise: jax.Array
    root_ending_bonus_points: jax.Array
    root_prune_useless_moves: jax.Array
    root_symmetry_pruning: jax.Array
    playout_doubling_advantage: jax.Array
    conservative_pass: jax.Array
    nn_random_symmetry: jax.Array
