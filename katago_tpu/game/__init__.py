from katago_tpu.game.rules import Rules
from katago_tpu.game.board import (
    EMPTY,
    BLACK,
    WHITE,
    WALL,
    BoardState,
    empty_board,
    connected_labels,
    chain_liberties,
    legal_moves_basic,
    play_move,
    area_score_tromp_taylor,
    pass_loc,
)
