"""Training losses — term-for-term port of the reference's Metrics
(python/katago/train/metrics_pytorch.py:78-324, target wiring
metrics_pytorch.py:497-860).

Consumes reference-schema batches (the npz arrays of
dataio/trainingwrite.py, already unpacked to float), so the same loss
stack trains on data from either this framework's selfplay or the
reference's. All loss scales and target-channel indices match the
reference exactly.

Differences from the torch implementation (deliberate, JAX-native):
  * The seki loss's moving unowned-proportion EMA is functional state
    threaded through (seki_ema in, seki_ema out) rather than a module
    buffer; under pmap/pjit it should be psum-averaged by the caller (the
    reference keeps it per-rank on device, seki_ema_on_device).
  * Everything is pure; "is_training" picks the EMA branch statically.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LossScales(NamedTuple):
    """Per-term multipliers the trainer may scale dynamically
    (value_loss_scale etc. in train.py); defaults match metrics_pytorch."""
    soft_policy_weight_scale: float = 8.0
    value_loss_scale: float = 1.0
    td_value_loss_scales: tuple = (0.6, 0.6, 0.6)
    seki_loss_scale: float = 1.0
    variance_time_loss_scale: float = 1.0
    main_loss_scale: float = 1.0
    intermediate_loss_scale: float = 1.0
    disable_optimistic_policy: bool = False
    predict_q_values: bool = True


class SekiEma(NamedTuple):
    """Moving unowned-proportion state (metrics_pytorch.py:210-222)."""
    sum: jax.Array     # f32
    weight: jax.Array  # f32

    @staticmethod
    def init() -> "SekiEma":
        return SekiEma(sum=jnp.float32(0.0), weight=jnp.float32(0.001))


def huber(x, target, delta):
    d = x - target
    absd = jnp.abs(d)
    return jnp.where(absd < delta, 0.5 * d * d, delta * (absd - 0.5 * delta))


def _cross_entropy(pred_logits, target_probs, axis):
    return -jnp.sum(target_probs * jax.nn.log_softmax(pred_logits, axis=axis),
                    axis=axis)


def softplus_with_floor(x, grad_floor=0.05, square=False):
    """SoftPlusWithGradientFloorFunction forward (model_pytorch.py:118-142):
    the gradient-floor trick only changes backward in torch; here the
    forward matches and JAX's autodiff of this composite is close enough in
    practice (the floor guards against dead units early in training).

    square: the v14+ variant — softplus(x/2)^2, used for the shortterm
    error heads so the engine-side error stdev is softplus(x/2)*sqrt(mult)
    (model_pytorch.py:4113-4114, nneval.cpp:1163-1168)."""
    if square:
        return jnp.square((1.0 - grad_floor) * jax.nn.softplus(0.5 * x)
                          + grad_floor * 0.5 * x)
    return (1.0 - grad_floor) * jax.nn.softplus(x) + grad_floor * x


# Postprocess multipliers (model_pytorch.py Model.__init__)
SCOREMEAN_MULT = 20.0
SCORESTDEV_MULT = 20.0
LEAD_MULT = 20.0
VARIANCE_TIME_MULT = 40.0
SHORTTERM_VALUE_ERROR_MULT = 0.25
SHORTTERM_SCORE_ERROR_MULT = 30.0
TD_SCORE_MULT = 20.0


def postprocess(raw: dict) -> dict:
    """Raw head outputs -> the reference's postprocess_single_heads_output
    quantities (model_pytorch.py:4084-4135)."""
    misc = raw["miscvalue"]            # [B,10]
    more = raw["moremiscvalue"]        # [B,8]
    td_value_logits = jnp.stack(
        [misc[:, 4:7], misc[:, 7:10], more[:, 2:5]], axis=1)  # [B,3,3]
    return {
        "policy_logits": raw["policy_logits"],              # [B,C,A]
        "value_logits": raw["value_logits"],                # [B,3]
        "td_value_logits": td_value_logits,
        "td_score": more[:, 5:8] * TD_SCORE_MULT,
        "ownership_pretanh": raw["ownership_pretanh"],      # [B,H,W]
        "scoring": raw["scoring_presoftmax"],               # [B,H,W]
        "futurepos_pretanh": raw["futurepos_pretanh"],      # [B,H,W,2]
        "seki_logits": raw["seki_logits"],                  # [B,H,W,4]
        "scoremean": misc[:, 0] * SCOREMEAN_MULT,
        "scorestdev": softplus_with_floor(misc[:, 1]) * SCORESTDEV_MULT,
        "lead": misc[:, 2] * LEAD_MULT,
        "variance_time": softplus_with_floor(misc[:, 3]) * VARIANCE_TIME_MULT,
        "shortterm_value_error":
            softplus_with_floor(more[:, 0], square=True)
            * SHORTTERM_VALUE_ERROR_MULT,
        "shortterm_score_error":
            softplus_with_floor(more[:, 1], square=True)
            * SHORTTERM_SCORE_ERROR_MULT,
        "scorebelief_logits": raw["scorebelief_logprobs"],  # [B,SB]
    }


def compute_losses(raw: dict, batch: dict, *,
                   scales: LossScales = LossScales(),
                   seki_ema: SekiEma | None = None,
                   is_training: bool = True,
                   main_loss_scale: float | None = None,
                   intermediate_loss_scale: float | None = None
                   ) -> tuple[jax.Array, dict, SekiEma]:
    """All reference loss terms for one batch.

    When `raw` carries intermediate-head outputs (intermediate_* keys,
    has_intermediate_head models) the same term set is computed on them
    (without the seki moving-average update, metrics_pytorch.py:461-484)
    and the total becomes main_loss_scale * main +
    intermediate_loss_scale * intermediate (both default 1).

    batch keys (reference npz schema, float-decoded):
      binaryInputNCHW  f32 [B, 22, H, W]   (only channel 0, the mask, read)
      globalTargetsNC  f32 [B, 80]         (trainingwrite.h:183-290)
      policyTargetsNCMove f32 [B, 2, A]
      scoreDistrN      f32 [B, SB]
      valueTargetsNCHW f32 [B, 5, H, W]    (decoded: own/seki in [-1,1],
                                            futurepos, scoring raw int8)
      qValueTargetsNCMove f32 [B, 3, A]    (raw int16 scale)

    Returns (total_loss_mean, metrics, new_seki_ema).
    """
    pp = postprocess(raw)
    if seki_ema is None:
        seki_ema = SekiEma.init()

    mask = batch["binaryInputNCHW"][:, 0, :, :]               # [B,H,W]
    n, h, w_ = mask.shape
    mask_sum_hw = jnp.sum(mask, axis=(1, 2))
    gt = batch["globalTargetsNC"]
    pol_t = batch["policyTargetsNCMove"]
    policymask = jnp.concatenate(
        [mask.reshape(n, h * w_), jnp.ones((n, 1), mask.dtype)], axis=1)

    def norm_pol(t):
        return t / jnp.maximum(jnp.sum(t, axis=1, keepdims=True), 1e-30)

    target_policy_player = norm_pol(pol_t[:, 0, :])
    target_policy_opponent = norm_pol(pol_t[:, 1, :])
    tpp_soft = jnp.power((target_policy_player + 1e-7) * policymask, 0.25)
    tpp_soft = norm_pol(tpp_soft)
    tpo_soft = jnp.power((target_policy_opponent + 1e-7) * policymask, 0.25)
    tpo_soft = norm_pol(tpo_soft)

    w_pol_player = gt[:, 26]
    w_pol_opp = gt[:, 28]
    target_value = gt[:, 0:3]
    target_scoremean = gt[:, 3]
    target_td_value = jnp.stack([gt[:, 4:7], gt[:, 8:11], gt[:, 12:15]],
                                axis=1)                        # [B,3,3]
    target_td_score = jnp.concatenate(
        [gt[:, 7:8], gt[:, 11:12], gt[:, 15:16]], axis=1)      # [B,3]
    target_lead = gt[:, 21]
    target_variance_time = gt[:, 22]
    global_weight = gt[:, 25]
    w_ownership = gt[:, 27]
    w_lead = gt[:, 29]
    w_futurepos = gt[:, 33]
    w_scoring = gt[:, 34]
    w_value = 1.0 - gt[:, 35]
    w_td_value = 1.0 - gt[:, 24]

    target_score_distribution = batch["scoreDistrN"] / 100.0

    vt = batch["valueTargetsNCHW"]
    target_ownership = vt[:, 0, :, :]
    target_seki = vt[:, 1, :, :]
    target_futurepos = vt[:, 2:4, :, :]
    target_scoring = vt[:, 4, :, :] / 120.0

    pol = pp["policy_logits"]

    def policy_ce(logits, target, weight, scale=1.0):
        return scale * jnp.sum(global_weight * weight *
                               _cross_entropy(logits, target, axis=1))

    loss_policy_player = policy_ce(pol[:, 0, :], target_policy_player,
                                   w_pol_player)
    loss_policy_opponent = policy_ce(pol[:, 1, :], target_policy_opponent,
                                     w_pol_opp, 0.15)
    sps = scales.soft_policy_weight_scale
    loss_policy_player_soft = sps * policy_ce(
        pol[:, 2, :], tpp_soft, w_pol_player)
    loss_policy_opponent_soft = sps * policy_ce(
        pol[:, 3, :], tpo_soft, w_pol_opp, 0.15)

    # optimistic policies (metrics_pytorch.py:653-733)
    if scales.disable_optimistic_policy:
        w_longopt = w_pol_player * 0.5
        w_shortopt = w_pol_player * 0.5
    else:
        win_squared = jnp.square(gt[:, 0] + 0.5 * gt[:, 2])
        lt_excess = (gt[:, 3] - jax.lax.stop_gradient(pp["scoremean"])) / \
            jnp.sqrt(jnp.square(jax.lax.stop_gradient(pp["scorestdev"]))
                     + 0.25)
        w_longopt = jnp.clip(
            win_squared + jax.nn.sigmoid((lt_excess - 1.5) * 3.0), 0.0, 1.0)
        w_longopt = w_longopt * w_pol_player * w_ownership

        st_val_actual = gt[:, 12] - gt[:, 13]
        st_val_pred = jax.nn.softmax(
            jax.lax.stop_gradient(pp["td_value_logits"][:, 2, :]), axis=1)
        st_val_pred = st_val_pred[:, 0] - st_val_pred[:, 1]
        st_val_excess = (st_val_actual - st_val_pred) / jnp.sqrt(
            jax.lax.stop_gradient(pp["shortterm_value_error"]) + 1e-4)
        st_score_excess = (gt[:, 15] -
                           jax.lax.stop_gradient(pp["td_score"][:, 2])) / \
            jnp.sqrt(jax.lax.stop_gradient(pp["shortterm_score_error"])
                     + 0.25)
        w_shortopt = jnp.clip(
            jax.nn.sigmoid((st_val_excess - 1.5) * 3.0) +
            jax.nn.sigmoid((st_score_excess - 1.5) * 3.0), 0.0, 1.0)
        w_shortopt = w_shortopt * w_pol_player * w_ownership

    loss_longopt = 0.100 * policy_ce(pol[:, 4, :], target_policy_player,
                                     w_longopt)
    loss_shortopt = 0.200 * policy_ce(pol[:, 5, :], target_policy_player,
                                      w_shortopt)
    # main policy optimism rescale (policy_opt_loss_scale = 0.930)
    loss_policy_player = loss_policy_player * 0.930

    loss_value = 1.20 * scales.value_loss_scale * jnp.sum(
        global_weight * w_value *
        _cross_entropy(pp["value_logits"], target_value, axis=1))

    td_ce = _cross_entropy(pp["td_value_logits"], target_td_value, axis=2) \
        - (-jnp.sum(target_td_value *
                    jnp.log(target_td_value + 1e-30), axis=2))
    td_l = 1.20 * global_weight[:, None] * w_td_value[:, None] * td_ce
    tds = jnp.asarray(scales.td_value_loss_scales)
    loss_td_value = jnp.sum(td_l * tds[None, :])

    loss_td_score = 0.0004 * jnp.sum(
        global_weight * w_ownership *
        jnp.sum(huber(pp["td_score"], target_td_score, 12.0), axis=1))

    own_logits = pp["ownership_pretanh"].reshape(n, -1) * 2.0
    own_probs = (1.0 + target_ownership.reshape(n, -1)) / 2.0
    own_bce = own_probs * jax.nn.log_sigmoid(own_logits) + \
        (1.0 - own_probs) * jax.nn.log_sigmoid(-own_logits)
    loss_ownership = 1.5 * jnp.sum(
        global_weight * w_ownership *
        jnp.sum(-own_bce * mask.reshape(n, -1), axis=1) / mask_sum_hw)

    sc_l = jnp.sum(jnp.square(pp["scoring"] - target_scoring) * mask,
                   axis=(1, 2)) / mask_sum_hw
    sc_l = 4.0 * (jnp.sqrt(sc_l * 0.5 + 1.0) - 1.0)
    # the 0.25 lives in the reference's loss_sum (metrics_pytorch.py:869)
    loss_scoring = 0.25 * jnp.sum(global_weight * w_scoring * sc_l)

    fp = pp["futurepos_pretanh"]                                # [B,H,W,2]
    fp_l = jnp.square(jnp.tanh(fp) - target_futurepos.transpose(0, 2, 3, 1)) \
        * mask[..., None]
    fp_l = fp_l * jnp.asarray([1.0, 0.25])[None, None, None, :]
    fp_l = jnp.sum(fp_l, axis=(1, 2, 3)) / jnp.sqrt(mask_sum_hw)
    loss_futurepos = 0.25 * jnp.sum(global_weight * w_futurepos * fp_l)

    # seki (metrics_pytorch.py:196-248)
    owned_t = jnp.square(target_ownership)
    unowned_t = 1.0 - owned_t
    unowned_prop = jnp.sum(unowned_t * mask, axis=(1, 2)) / (1.0 + mask_sum_hw)
    unowned_prop = jnp.mean(unowned_prop * w_ownership)
    if is_training:
        ema = SekiEma(sum=seki_ema.sum * 0.998 +
                      jax.lax.stop_gradient(unowned_prop),
                      weight=seki_ema.weight * 0.998 + 1.0)
        moving_prop = ema.sum / ema.weight
        seki_weight_scale = 8.0 * 0.005 / (0.005 + moving_prop)
    else:
        ema = seki_ema
        seki_weight_scale = jnp.float32(7.0)
    seki_logits = pp["seki_logits"].transpose(0, 3, 1, 2)       # [B,4,H,W]
    sign_pred = seki_logits[:, 0:3, :, :]
    sign_target = jnp.stack([
        1.0 - jnp.square(target_seki),
        jax.nn.relu(target_seki),
        jax.nn.relu(-target_seki),
    ], axis=1)
    loss_sign = jnp.sum(_cross_entropy(sign_pred, sign_target, axis=1) * mask,
                        axis=(1, 2))
    neutral_pred = jnp.stack(
        [seki_logits[:, 3, :, :], jnp.zeros_like(target_ownership)], axis=1)
    neutral_target = jnp.stack([unowned_t, owned_t], axis=1)
    loss_neutral = jnp.sum(
        _cross_entropy(neutral_pred, neutral_target, axis=1) * mask,
        axis=(1, 2))
    seki_l = (loss_sign + 0.5 * loss_neutral) / mask_sum_hw
    loss_seki = scales.seki_loss_scale * seki_weight_scale * jnp.sum(
        global_weight * w_ownership * seki_l)

    loss_scoremean = 0.0015 * jnp.sum(
        global_weight * w_ownership *
        huber(pp["scoremean"], target_scoremean, 12.0))

    sb_logits = pp["scorebelief_logits"]
    pred_cdf = jnp.cumsum(jax.nn.softmax(sb_logits, axis=1), axis=1)
    target_cdf = jnp.cumsum(target_score_distribution, axis=1)
    loss_sb_cdf = 0.020 * jnp.sum(
        global_weight * w_ownership *
        jnp.sum(jnp.square(pred_cdf - target_cdf), axis=1))
    loss_sb_pdf = 0.020 * jnp.sum(
        global_weight * w_ownership *
        _cross_entropy(sb_logits, target_score_distribution, axis=1))

    sb_len = sb_logits.shape[1]
    mid = sb_len // 2
    offsets = jnp.arange(sb_len, dtype=jnp.float32) - mid + 0.5
    sb_probs = jax.nn.softmax(sb_logits, axis=1)
    exp_score = jnp.sum(sb_probs * offsets[None, :], axis=1, keepdims=True)
    stdev_belief = jnp.sqrt(0.001 + jnp.sum(
        sb_probs * jnp.square(offsets[None, :] - exp_score), axis=1))
    loss_scorestdev = 0.001 * jnp.sum(
        global_weight * huber(pp["scorestdev"], stdev_belief, 10.0))

    loss_lead = 0.0060 * jnp.sum(
        global_weight * w_lead * huber(pp["lead"], target_lead, 8.0))
    loss_variance_time = 0.0003 * scales.variance_time_loss_scale * jnp.sum(
        global_weight * w_ownership *
        huber(pp["variance_time"], target_variance_time + 1e-5, 50.0))

    # shortterm error heads (squared-softplus targets)
    td3_probs = jax.nn.softmax(
        jax.lax.stop_gradient(pp["td_value_logits"][:, 2, :]), axis=1)
    predvalue = td3_probs[:, 0] - td3_probs[:, 1]
    realvalue = target_td_value[:, 2, 0] - target_td_value[:, 2, 1]
    sqerr_v = jnp.square(predvalue - realvalue) + 1e-8
    loss_st_value_err = 2.0 * jnp.sum(
        global_weight * w_ownership *
        huber(pp["shortterm_value_error"], sqerr_v, 0.4))
    predscore = jax.lax.stop_gradient(pp["td_score"][:, 2])
    realscore = target_td_score[:, 2]
    sqerr_s = jnp.square(predscore - realscore) + 1e-4
    loss_st_score_err = 0.00002 * jnp.sum(
        global_weight * w_ownership *
        huber(pp["shortterm_score_error"], sqerr_s, 100.0))

    # q-value heads (policy channels 6,7; metrics_pytorch.py:90-118)
    if scales.predict_q_values and pol.shape[1] >= 8:
        qt = batch["qValueTargetsNCMove"]
        t_wl = qt[:, 0, :] / 32000.0
        t_sc = qt[:, 1, :] / 60.0
        t_vis = qt[:, 2, :]
        qmask = (t_vis != 0).astype(jnp.float32)
        sqrtv = jnp.sqrt(jnp.maximum(t_vis, 0.0))
        sum_sqrtv = jnp.sum(sqrtv, axis=1)
        wl_logits = pol[:, 6, :] * qmask * 2.0
        wl_probs = (1.0 + t_wl) / 2.0
        q_bce = -(wl_probs * jax.nn.log_sigmoid(wl_logits) +
                  (1.0 - wl_probs) * jax.nn.log_sigmoid(-wl_logits))
        l_q_wl = jnp.sum(q_bce * sqrtv, axis=1) / (sum_sqrtv + 1.0)
        loss_q_winloss = 1.5 * jnp.sum(global_weight * l_q_wl)
        q_score = pol[:, 7, :] * qmask * SCOREMEAN_MULT
        l_q_sc = jnp.sum(huber(q_score, t_sc, 12.0) * sqrtv, axis=1) / \
            (sum_sqrtv + 1.0)
        loss_q_score = 0.0008 * jnp.sum(global_weight * l_q_sc)
    else:
        loss_q_winloss = jnp.float32(0.0)
        loss_q_score = jnp.float32(0.0)

    nsum = jnp.maximum(jnp.sum(global_weight), 1e-8)
    total = (loss_policy_player + loss_policy_opponent +
             loss_policy_player_soft + loss_policy_opponent_soft +
             loss_longopt + loss_shortopt +
             loss_value + loss_td_value + loss_td_score +
             loss_ownership + loss_scoring + loss_futurepos + loss_seki +
             loss_scoremean + loss_sb_cdf + loss_sb_pdf + loss_scorestdev +
             loss_lead + loss_variance_time +
             loss_st_value_err + loss_st_score_err +
             loss_q_winloss + loss_q_score) * scales.main_loss_scale

    metrics = {
        "loss": total / nsum,
        "policy_loss": loss_policy_player / nsum,
        "policy_opp_loss": loss_policy_opponent / nsum,
        "policy_soft_loss": loss_policy_player_soft / nsum,
        "optimistic_policy_loss": (loss_longopt + loss_shortopt) / nsum,
        "value_loss": loss_value / nsum,
        "td_value_loss": loss_td_value / nsum,
        "td_score_loss": loss_td_score / nsum,
        "ownership_loss": loss_ownership / nsum,
        "scoring_loss": loss_scoring / nsum,
        "futurepos_loss": loss_futurepos / nsum,
        "seki_loss": loss_seki / nsum,
        "seki_weight_scale": seki_weight_scale,
        "scoremean_loss": loss_scoremean / nsum,
        "scorebelief_loss": (loss_sb_cdf + loss_sb_pdf) / nsum,
        "scorestdev_loss": loss_scorestdev / nsum,
        "lead_loss": loss_lead / nsum,
        "variance_time_loss": loss_variance_time / nsum,
        "shortterm_error_loss": (loss_st_value_err + loss_st_score_err) / nsum,
        "qvalue_loss": (loss_q_winloss + loss_q_score) / nsum,
        "policy_acc1": jnp.sum(
            global_weight * w_pol_player *
            (jnp.argmax(pol[:, 0, :], -1) ==
             jnp.argmax(target_policy_player, -1)).astype(jnp.float32)) / nsum,
    }
    total_mean = total / nsum
    if any(k.startswith("intermediate_") for k in raw):
        inter_raw = {k[len("intermediate_"):]: v for k, v in raw.items()
                     if k.startswith("intermediate_")}
        itotal, imetrics, _ = compute_losses(
            inter_raw, batch, scales=scales, seki_ema=seki_ema,
            is_training=False)
        ms = scales.main_loss_scale if main_loss_scale is None \
            else main_loss_scale
        isc = scales.intermediate_loss_scale if intermediate_loss_scale \
            is None else intermediate_loss_scale
        metrics["intermediate_loss"] = itotal
        metrics["intermediate_policy_loss"] = imetrics["policy_loss"]
        metrics["intermediate_value_loss"] = imetrics["value_loss"]
        total_mean = ms * total_mean + isc * itotal
        metrics["loss"] = total_mean
    return total_mean, metrics, ema
