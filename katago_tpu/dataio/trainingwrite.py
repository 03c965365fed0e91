"""Training-data npz writer/reader — reference schema interop.

Writes selfplay rows in the exact array layout of the reference's
TrainingDataWriter (cpp/dataio/trainingwrite.h:183-290 — channel map cited
inline below), so the reference's shuffle.py / training tools can consume
our data and vice versa:

  binaryInputNCHWPacked uint8  [N, 22, ceil(area/8)]   bit-packed V7 planes
  globalInputNC         float  [N, 19]
  policyTargetsNCMove   int16  [N, 2, area+1]          C0 this turn, C1 next
  globalTargetsNC       float  [N, 80]                 targets/weights map
  scoreDistrN           int8   [N, 2*area+120]         two-hot final score
  valueTargetsNCHW      int8   [N, 5, H, W]            ownership etc.
  qValueTargetsNCMove   int16  [N, 3, area+1]

Fields not yet produced by the minimum slice (futurepos, seki aux, q-value
targets, reanalysis channels) are zero-filled with their weight channels 0,
which the reference reader treats as "absent" — files remain valid.
"""

from __future__ import annotations

import numpy as np

GLOBAL_TARGET_CHANNELS = 80
EXTRA_SCORE_DISTR_RADIUS = 60

# lambda constants for the td-value targets (trainingwrite.h C4-C19)
TD_LAMBDA_COEFFS = (0.176, 0.056, 0.016, 0.0)


def td_lambda_for_area(board_area: int, coeff: float) -> float:
    if coeff == 0.0:
        return 0.0
    return 1.0 - 1.0 / (1.0 + board_area * coeff)


def td_value_targets(mcts_winloss: np.ndarray, final_winloss: float,
                     board_area: int) -> np.ndarray:
    """[T, 4*4] td-like targets: for each lambda, the exponentially-weighted
    forward-looking blend of future MCTS winloss estimates and the final
    result, all from a fixed (white) perspective then flipped by caller.

    mcts_winloss: [T] root MCTS winloss (white persp) per turn.
    final_winloss: scalar game result in [-1, 1] (white persp).
    Returns [T, 4] per-lambda targets (win-minus-loss form).
    """
    t = len(mcts_winloss)
    out = np.zeros((t, len(TD_LAMBDA_COEFFS)), np.float32)
    for i, coeff in enumerate(TD_LAMBDA_COEFFS):
        lam = td_lambda_for_area(board_area, coeff)
        # backward recursion: v_t = (1-lam)*m_{t+1} + lam*v_{t+1}; v_T = final
        v = final_winloss
        for k in range(t - 1, -1, -1):
            m = mcts_winloss[k + 1] if k + 1 < t else final_winloss
            v = (1.0 - lam) * m + lam * v
            out[k, i] = v
    return out


def pack_rows(spatial: np.ndarray, global_in: np.ndarray,
              policy_target: np.ndarray, next_policy_target: np.ndarray,
              value_target: np.ndarray, td_targets: np.ndarray,
              score_target: np.ndarray, lead_target: np.ndarray,
              ownership_target: np.ndarray, self_komi: np.ndarray,
              turn_idx: np.ndarray, visits: np.ndarray,
              size: int) -> dict[str, np.ndarray]:
    """Assemble reference-schema arrays from mover-perspective row data.

    spatial [N,H,W,22] f32 binary; policy targets [N,area+1] probabilities
    (converted to visit-count int16); td_targets [N,4] win-minus-loss.
    """
    n = spatial.shape[0]
    area = size * size

    planes = np.transpose(spatial.astype(np.uint8), (0, 3, 1, 2))  # NCHW
    packed = np.packbits(planes.reshape(n, 22, area), axis=2)

    pol = np.zeros((n, 2, area + 1), np.int16)
    pol[:, 0] = np.round(policy_target * 30000).astype(np.int16)
    pol[:, 1] = np.round(next_policy_target * 30000).astype(np.int16)

    gt = np.zeros((n, GLOBAL_TARGET_CHANNELS), np.float32)
    gt[:, 0] = value_target[:, 0]           # win
    gt[:, 1] = value_target[:, 1]           # loss
    gt[:, 2] = value_target[:, 2]           # noresult
    gt[:, 3] = score_target                 # C3: score as value-ish channel
    for i in range(4):                      # C4..C19 td winloss targets
        wl = td_targets[:, i]
        gt[:, 4 + 4 * i + 0] = 0.5 * (1.0 + wl)
        gt[:, 4 + 4 * i + 1] = 0.5 * (1.0 - wl)
        gt[:, 4 + 4 * i + 2] = 0.0
        gt[:, 4 + 4 * i + 3] = score_target
    gt[:, 20] = score_target                # C20 final score
    gt[:, 21] = lead_target                 # C21 lead
    gt[:, 24] = 0.0                         # full weight on td targets
    gt[:, 25] = 1.0                         # C25 row weight
    gt[:, 26] = 1.0                         # C26 policy weight
    gt[:, 27] = 1.0                         # C27 ownership/scoredistr weight
    gt[:, 28] = (next_policy_target.sum(-1) > 0).astype(np.float32)
    gt[:, 29] = 1.0                         # C29 lead weight
    gt[:, 36:41] = 1.0                      # C36-40 history-usable flags
    gt[:, 47] = self_komi                   # C47 komi (mover persp)
    gt[:, 48] = 1.0                         # C48 area-scoring phase
    gt[:, 51] = turn_idx                    # C51 turn index
    gt[:, 60] = visits                      # C60 search visits
    gt[:, 62] = 1.0                         # C62 game finished
    gt[:, 63] = 3.0                         # C63 data format version

    # score distribution: two-hot at the actual final score (+0.5 offsets)
    distr_len = 2 * area + 2 * EXTRA_SCORE_DISTR_RADIUS
    mid = distr_len // 2
    sd = np.zeros((n, distr_len), np.int8)
    idx_f = score_target + mid - 0.5
    lo = np.clip(np.floor(idx_f).astype(np.int64), 0, distr_len - 1)
    hi = np.clip(lo + 1, 0, distr_len - 1)
    frac = np.clip(idx_f - lo, 0.0, 1.0)
    rows = np.arange(n)
    sd[rows, lo] = np.round((1.0 - frac) * 100).astype(np.int8)
    sd[rows, hi] = np.clip(sd[rows, hi] + np.round(frac * 100), -128, 127).astype(np.int8)

    # C0 ownership is stored raw in [-1,1] (trainingwrite.h:286 — only C4
    # area/territory uses the [-120,120] scale)
    vt = np.zeros((n, 5, size, size), np.int8)
    vt[:, 0] = np.round(ownership_target.reshape(n, size, size)).astype(np.int8)

    qv = np.zeros((n, 3, area + 1), np.int16)

    return {
        "binaryInputNCHWPacked": packed,
        "globalInputNC": global_in.astype(np.float32),
        "policyTargetsNCMove": pol,
        "globalTargetsNC": gt,
        "scoreDistrN": sd,
        "valueTargetsNCHW": vt,
        "qValueTargetsNCMove": qv,
    }


def write_npz(path: str, arrays: dict[str, np.ndarray]):
    np.savez_compressed(path, **arrays)


def decode_rows(arrays: dict[str, np.ndarray], size: int
                ) -> dict[str, np.ndarray]:
    """Schema arrays (as stored on disk) -> the learner's float batch dict:
    binary planes unpacked to float NCHW, everything else float-cast raw
    (matching data_processing_pytorch.py:28-299 — per-channel scaling like
    scoreDistrN/100 or valueTargets C4/120 happens inside the loss)."""
    area = size * size
    packed = arrays["binaryInputNCHWPacked"]
    n = packed.shape[0]
    planes = np.unpackbits(packed, axis=2)[:, :, :area]
    binary = planes.reshape(n, 22, size, size).astype(np.float32)
    return {
        "binaryInputNCHW": binary,
        "globalInputNC": arrays["globalInputNC"].astype(np.float32),
        "policyTargetsNCMove":
            arrays["policyTargetsNCMove"].astype(np.float32),
        "globalTargetsNC": arrays["globalTargetsNC"].astype(np.float32),
        "scoreDistrN": arrays["scoreDistrN"].astype(np.float32),
        "valueTargetsNCHW": arrays["valueTargetsNCHW"].astype(np.float32),
        "qValueTargetsNCMove":
            arrays["qValueTargetsNCMove"].astype(np.float32),
    }


def read_npz(path: str, size: int) -> dict[str, np.ndarray]:
    """Read a reference-schema npz into the learner's batch dict."""
    with np.load(path) as z:
        return decode_rows({k: z[k] for k in z.files if k != "metadataInputNC"
                            }, size)
