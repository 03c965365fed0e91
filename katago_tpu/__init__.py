"""katago_tpu: a TPU-native (JAX/XLA/Pallas) self-play Go framework.

A from-scratch rebuild of the capabilities of lightvector/KataGo, designed
array-first for TPUs: the rules engine steps thousands of games in lockstep
under jit, search is a batched array-MCTS over a device-resident node pool,
and selfplay + training run as one fused program over a jax.sharding.Mesh.

Package layout (mirrors SURVEY.md section 2's component inventory):
  game/      vectorized rules engine (reference: cpp/game/)
  models/    neural nets + featurizer (reference: cpp/neuralnet/, python/katago/train/model_pytorch.py)
  search/    array-MCTS/MCGS (reference: cpp/search/)
  train/     learner: losses, optimizer, checkpoints (reference: python/train.py)
  selfplay/  fused actor loop + data writing (reference: cpp/command/selfplay.cpp, cpp/program/play.cpp)
  parallel/  mesh/sharding utilities (reference: NCCL DDP -> XLA collectives)
  utils/     config parser, elo, logging (reference: cpp/core/)
  cli/       GTP / analysis / match / benchmark front-ends (reference: cpp/command/)
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("KATAGO_TPU_PLATFORM"):
    # Explicit backend override (e.g. KATAGO_TPU_PLATFORM=cpu for host-side
    # tooling in environments where a site hook force-registers a remote
    # accelerator ahead of JAX_PLATFORMS).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["KATAGO_TPU_PLATFORM"])
