"""AV1 enumerations and geometry constants (normative, from the AV1 spec).

Mirrors the surface of the reference's definitions.h / block_structures.h —
values are fixed by the AV1 bitstream specification.
"""

from __future__ import annotations

import enum

import numpy as np

MI_SIZE_LOG2 = 2
MI_SIZE = 4          # mode-info unit in pixels
MAX_SB_SIZE = 128
MAX_MIB_SIZE_LOG2 = 5

MAX_QINDEX = 255
QINDEX_RANGE = 256


class BlockSize(enum.IntEnum):
    BLOCK_4X4 = 0
    BLOCK_4X8 = 1
    BLOCK_8X4 = 2
    BLOCK_8X8 = 3
    BLOCK_8X16 = 4
    BLOCK_16X8 = 5
    BLOCK_16X16 = 6
    BLOCK_16X32 = 7
    BLOCK_32X16 = 8
    BLOCK_32X32 = 9
    BLOCK_32X64 = 10
    BLOCK_64X32 = 11
    BLOCK_64X64 = 12
    BLOCK_64X128 = 13
    BLOCK_128X64 = 14
    BLOCK_128X128 = 15
    BLOCK_4X16 = 16
    BLOCK_16X4 = 17
    BLOCK_8X32 = 18
    BLOCK_32X8 = 19
    BLOCK_16X64 = 20
    BLOCK_64X16 = 21


BLOCK_SIZES_ALL = 22

# width/height in pixels per BlockSize
BLOCK_WIDTH = np.array(
    [4, 4, 8, 8, 8, 16, 16, 16, 32, 32, 32, 64, 64, 64, 128, 128, 4, 16, 8, 32, 16, 64]
)
BLOCK_HEIGHT = np.array(
    [4, 8, 4, 8, 16, 8, 16, 32, 16, 32, 64, 32, 64, 128, 64, 128, 16, 4, 32, 8, 64, 16]
)


class TxSize(enum.IntEnum):
    TX_4X4 = 0
    TX_8X8 = 1
    TX_16X16 = 2
    TX_32X32 = 3
    TX_64X64 = 4
    TX_4X8 = 5
    TX_8X4 = 6
    TX_8X16 = 7
    TX_16X8 = 8
    TX_16X32 = 9
    TX_32X16 = 10
    TX_32X64 = 11
    TX_64X32 = 12
    TX_4X16 = 13
    TX_16X4 = 14
    TX_8X32 = 15
    TX_32X8 = 16
    TX_16X64 = 17
    TX_64X16 = 18


TX_SIZES = 5          # square sizes only
TX_SIZES_ALL = 19

TX_WIDTH = np.array([4, 8, 16, 32, 64, 4, 8, 8, 16, 16, 32, 32, 64, 4, 16, 8, 32, 16, 64])
TX_HEIGHT = np.array([4, 8, 16, 32, 64, 8, 4, 16, 8, 32, 16, 64, 32, 16, 4, 32, 8, 64, 16])

# square "context" size used for coefficient CDFs (txsize_sqr_map)
TX_SIZE_SQR = np.array([0, 1, 2, 3, 4, 0, 0, 1, 1, 2, 2, 3, 3, 0, 0, 1, 1, 2, 2])
# min(sqr-up map) used for some contexts (txsize_sqr_up_map)
TX_SIZE_SQR_UP = np.array([0, 1, 2, 3, 4, 1, 1, 2, 2, 3, 3, 4, 4, 2, 2, 3, 3, 4, 4])


class TxType(enum.IntEnum):
    DCT_DCT = 0
    ADST_DCT = 1
    DCT_ADST = 2
    ADST_ADST = 3
    FLIPADST_DCT = 4
    DCT_FLIPADST = 5
    FLIPADST_FLIPADST = 6
    ADST_FLIPADST = 7
    FLIPADST_ADST = 8
    IDTX = 9
    V_DCT = 10
    H_DCT = 11
    V_ADST = 12
    H_ADST = 13
    V_FLIPADST = 14
    H_FLIPADST = 15


TX_TYPES = 16


class TxType1D(enum.IntEnum):
    DCT = 0
    ADST = 1
    FLIPADST = 2
    IDTX = 3


# (vertical, horizontal) 1-D transform per 2-D type
TX_TYPE_1D = {
    TxType.DCT_DCT: (TxType1D.DCT, TxType1D.DCT),
    TxType.ADST_DCT: (TxType1D.ADST, TxType1D.DCT),
    TxType.DCT_ADST: (TxType1D.DCT, TxType1D.ADST),
    TxType.ADST_ADST: (TxType1D.ADST, TxType1D.ADST),
    TxType.FLIPADST_DCT: (TxType1D.FLIPADST, TxType1D.DCT),
    TxType.DCT_FLIPADST: (TxType1D.DCT, TxType1D.FLIPADST),
    TxType.FLIPADST_FLIPADST: (TxType1D.FLIPADST, TxType1D.FLIPADST),
    TxType.ADST_FLIPADST: (TxType1D.ADST, TxType1D.FLIPADST),
    TxType.FLIPADST_ADST: (TxType1D.FLIPADST, TxType1D.ADST),
    TxType.IDTX: (TxType1D.IDTX, TxType1D.IDTX),
    TxType.V_DCT: (TxType1D.DCT, TxType1D.IDTX),
    TxType.H_DCT: (TxType1D.IDTX, TxType1D.DCT),
    TxType.V_ADST: (TxType1D.ADST, TxType1D.IDTX),
    TxType.H_ADST: (TxType1D.IDTX, TxType1D.ADST),
    TxType.V_FLIPADST: (TxType1D.FLIPADST, TxType1D.IDTX),
    TxType.H_FLIPADST: (TxType1D.IDTX, TxType1D.FLIPADST),
}


class PredictionMode(enum.IntEnum):
    DC_PRED = 0
    V_PRED = 1
    H_PRED = 2
    D45_PRED = 3
    D135_PRED = 4
    D113_PRED = 5
    D157_PRED = 6
    D203_PRED = 7
    D67_PRED = 8
    SMOOTH_PRED = 9
    SMOOTH_V_PRED = 10
    SMOOTH_H_PRED = 11
    PAETH_PRED = 12


INTRA_MODES = 13
UV_INTRA_MODES = 14  # + CFL when allowed


class UVPredictionMode(enum.IntEnum):
    UV_DC_PRED = 0
    UV_V_PRED = 1
    UV_H_PRED = 2
    UV_D45_PRED = 3
    UV_D135_PRED = 4
    UV_D113_PRED = 5
    UV_D157_PRED = 6
    UV_D203_PRED = 7
    UV_D67_PRED = 8
    UV_SMOOTH_PRED = 9
    UV_SMOOTH_V_PRED = 10
    UV_SMOOTH_H_PRED = 11
    UV_PAETH_PRED = 12
    UV_CFL_PRED = 13


class PartitionType(enum.IntEnum):
    PARTITION_NONE = 0
    PARTITION_HORZ = 1
    PARTITION_VERT = 2
    PARTITION_SPLIT = 3
    PARTITION_HORZ_A = 4
    PARTITION_HORZ_B = 5
    PARTITION_VERT_A = 6
    PARTITION_VERT_B = 7
    PARTITION_HORZ_4 = 8
    PARTITION_VERT_4 = 9


EXT_PARTITION_TYPES = 10


class FrameType(enum.IntEnum):
    KEY_FRAME = 0
    INTER_FRAME = 1
    INTRA_ONLY_FRAME = 2
    S_FRAME = 3


class ObuType(enum.IntEnum):
    SEQUENCE_HEADER = 1
    TEMPORAL_DELIMITER = 2
    FRAME_HEADER = 3
    TILE_GROUP = 4
    METADATA = 5
    FRAME = 6
    REDUNDANT_FRAME_HEADER = 7
    TILE_LIST = 8
    PADDING = 15


# coefficient coding constants (AV1 spec §5.11.39+)
TOKEN_CDF_Q_CTXS = 4
PLANE_TYPES = 2
TXB_SKIP_CONTEXTS = 13
SIG_COEF_CONTEXTS_2D = 26
SIG_COEF_CONTEXTS_1D = 16
SIG_COEF_CONTEXTS_EOB = 4
SIG_COEF_CONTEXTS = 42
EOB_COEF_CONTEXTS = 9
LEVEL_CONTEXTS = 21
DC_SIGN_CONTEXTS = 3
NUM_BASE_LEVELS = 2
BR_CDF_SIZE = 4
COEFF_BASE_RANGE = 4 * (BR_CDF_SIZE - 1)  # 12
MAX_BASE_BR_RANGE = COEFF_BASE_RANGE + NUM_BASE_LEVELS + 1  # 15


def coeff_qctx(base_qindex: int) -> int:
    """Quantizer context for the default coefficient CDF set (spec: get_q_ctx)."""
    if base_qindex <= 20:
        return 0
    if base_qindex <= 60:
        return 1
    if base_qindex <= 120:
        return 2
    return 3
