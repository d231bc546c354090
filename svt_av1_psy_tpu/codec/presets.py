"""Preset system as data (enc_mode_config.c:681-1204 re-expressed).

The reference drives its speed/quality ladder through ~200 leveling
functions that toggle tools and shrink search spaces per preset. Here the
same surface is a table: each preset row sets the RDO search shape consumed
by codec/intra_rdo + the encoders. Presets -3..13 accepted (MR/research
modes clamp to the deepest row).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PresetConfig:
    # intra RDO (device search)
    rdo: bool                  # run the device RDO search at all
    depths: tuple              # square block sizes searched (partition DP)
    tx_search_depths: tuple    # sizes with TX-type search
    filter_intra_search: bool  # try the 5 recursive filter-intra modes
    cfl_search: bool           # chroma-from-luma alpha search
    # filters
    cdef_search_sample: int    # CDEF strength-search sampling stride
    restoration: bool          # Wiener/SGR restoration search
    # analysis
    scene_change: bool
    tpl: bool
    sgr_eps_step: int = 1      # SGR parameter-set sampling stride (1 = all 16)
    gm: bool = True            # global-motion estimation (gm_level analog:
                               # the reference disables GM at fast presets)
    inter_depths: tuple = (32,)  # square leaf sizes searched by the inter
                                 # partition DP (NONE-vs-SPLIT recursion)
    rdoq_fast: bool = False      # RDOQ eob-fast tier on inter residuals
                                 # (rdoq_ctrls eob_fast analog)
    inter_rect: bool = False     # PARTITION_HORZ/VERT candidates in the
                                 # inter DP (product_coding_loop.c:9791)
    tx_size_search: bool = False  # one-depth var-tx split search on inter
                                  # leaves (perform_tx_partitioning,
                                  # product_coding_loop.c:5307)
    inter_part4: bool = False     # HORZ_4/VERT_4 strip partitions at the
                                  # research presets (4 extra rect jobs
                                  # per 32/64 node)


# speed ladder (preset index -2..13; -3/-2 are research modes = row 0).
# filter-intra search runs at presets <= 3 (filter_intra_level gating,
# enc_mode_config.c): the search lives in the Python walk today, which
# forfeits the C tile walk — acceptable at the research/quality presets,
# a 7x intra-frame cost at p6. (The device-RDO fi scoring path is the
# planned home: fi prediction is near-linear in the neighbors.)
_LADDER = (
    # depths            tx-depths   fi     cfl    cdef rest scd   tpl
    ((8, 16, 32, 64), (8, 16),     True,  True,  1,   True, True, True),   # <=0
    ((8, 16, 32, 64), (8, 16),     True,  True,  1,   True, True, True),   # 1
    ((8, 16, 32, 64), (8, 16),     True,  True,  1,   True, True, True),   # 2
    ((8, 16, 32, 64), (8, 16),     True,  True,  2,   True, True, True),   # 3
    ((8, 16, 32),     (8, 16),     False, True,  2,   True, True, True),   # 4
    ((8, 16, 32),     (8, 16),     False, True,  2,   True, True, True),   # 5
    ((8, 16, 32),     (8, 16),     False, True,  2,   True, True, True),   # 6
    ((8, 16, 32),     (16,),       False, True,  4,   True, True, True),   # 7
    ((8, 16, 32),     (16,),       False, True,  4,   True, True, True),   # 8
    ((16, 32),        (),          False, True,  4,   False, True, True),  # 9
    ((16, 32),        (),          False, True,  4,   False, True, False), # 10
    ((16, 32),        (),          False, False, 8,   False, True, False), # 11
    ((32,),           (),          False, False, 8,   False, False, False),# 12
    ((32, 64),        (),          False, False, 8,   False, False, False),# 13
)


def preset_config(preset: int) -> PresetConfig:
    p = min(max(preset, 0), 13)
    row = _LADDER[p]
    return PresetConfig(rdo=True, depths=row[0], tx_search_depths=row[1],
                        filter_intra_search=row[2], cfl_search=row[3],
                        cdef_search_sample=row[4], restoration=row[5],
                        scene_change=row[6], tpl=row[7],
                        # SGR search cost scales with the ep count; fast
                        # presets go Wiener-only (step 0 = skip SGR)
                        sgr_eps_step=1 if p <= 4 else (2 if p <= 6 else 0),
                        gm=p <= 11,
                        # research presets (-3/-2/0) search the full inter
                        # partition depth set (ENC_MRS analog)
                        inter_depths=((8, 16, 32, 64) if preset <= 0
                                      else (16, 32, 64) if p <= 5
                                      else (32, 64) if p <= 9 else (32,)),
                        rdoq_fast=p >= 5,
                        # HORZ/VERT partition candidates (-2.8% bytes
                        # +0.27dB at p6). Priced by the native seeded
                        # kernel (~3x the decide cost), so gated to the
                        # quality presets like the reference's rect
                        # partition leveling (enc_mode_config.c)
                        inter_rect=p <= 6,
                        # var-tx split search rides the existing TX-type
                        # batch; quality presets only (tx_size_early_exit
                        # leveling analog)
                        tx_size_search=p <= 6,
                        inter_part4=preset <= 3)
