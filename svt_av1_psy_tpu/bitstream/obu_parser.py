"""AV1 OBU header parser (sequence + uncompressed frame header, intra subset).

Used for tests and debugging: parse golden streams (rav1e via PIL) and our
own output with the same spec-faithful reader, so writer/reader asymmetries
surface immediately. Mirrors the AV1 spec §5.5/§5.9 read order.
"""

from __future__ import annotations

from .bitwriter import BitReader, read_leb128


def parse_obus(payload: bytes):
    out = []
    pos = 0
    while pos < len(payload):
        b0 = payload[pos]
        obu_type = (b0 >> 3) & 0xF
        ext = (b0 >> 2) & 1
        has_size = (b0 >> 1) & 1
        i = pos + 1 + ext
        if has_size:
            sz, i = read_leb128(payload, i)
        else:
            sz = len(payload) - i
        out.append((obu_type, payload[i : i + sz]))
        pos = i + sz
    return out


def parse_sequence_header(data: bytes) -> dict:
    r = BitReader(data)
    s = {}
    s["seq_profile"] = r.f(3)
    s["still_picture"] = r.f(1)
    s["reduced_still_picture_header"] = r.f(1)
    if s["reduced_still_picture_header"]:
        s["seq_level_idx"] = r.f(5)
        s["timing_info_present"] = 0
        s["decoder_model_info_present"] = 0
        s["initial_display_delay_present"] = 0
        s["operating_points_cnt"] = 1
    else:
        s["timing_info_present"] = r.f(1)
        assert not s["timing_info_present"], "timing info unsupported"
        s["initial_display_delay_present"] = r.f(1)
        n = r.f(5) + 1
        s["operating_points_cnt"] = n
        s["op_idc"] = []
        s["seq_level_idx"] = []
        for i in range(n):
            s["op_idc"].append(r.f(12))
            lvl = r.f(5)
            s["seq_level_idx"].append(lvl)
            if lvl > 7:
                r.f(1)  # seq_tier
            if s["initial_display_delay_present"]:
                if r.f(1):
                    r.f(4)
    wb = r.f(4) + 1
    hb = r.f(4) + 1
    s["max_frame_width"] = r.f(wb) + 1
    s["max_frame_height"] = r.f(hb) + 1
    if not s["reduced_still_picture_header"]:
        s["frame_id_numbers_present"] = r.f(1)
        assert not s["frame_id_numbers_present"]
    s["use_128x128_superblock"] = r.f(1)
    s["enable_filter_intra"] = r.f(1)
    s["enable_intra_edge_filter"] = r.f(1)
    if s["reduced_still_picture_header"]:
        s["enable_order_hint"] = 0
        s["seq_force_screen_content_tools"] = 2
        s["seq_force_integer_mv"] = 2
    else:
        s["enable_interintra_compound"] = r.f(1)
        s["enable_masked_compound"] = r.f(1)
        s["enable_warped_motion"] = r.f(1)
        s["enable_dual_filter"] = r.f(1)
        s["enable_order_hint"] = r.f(1)
        if s["enable_order_hint"]:
            s["enable_jnt_comp"] = r.f(1)
            s["enable_ref_frame_mvs"] = r.f(1)
        s["seq_force_screen_content_tools"] = 2 if r.f(1) else r.f(1)
        if s["seq_force_screen_content_tools"] > 0:
            s["seq_force_integer_mv"] = 2 if r.f(1) else r.f(1)
        else:
            s["seq_force_integer_mv"] = 2
        if s["enable_order_hint"]:
            s["order_hint_bits"] = r.f(3) + 1
    s["enable_superres"] = r.f(1)
    s["enable_cdef"] = r.f(1)
    s["enable_restoration"] = r.f(1)
    # color config
    s["high_bitdepth"] = r.f(1)
    if s["seq_profile"] == 2 and s["high_bitdepth"]:
        s["twelve_bit"] = r.f(1)
    s["monochrome"] = r.f(1) if s["seq_profile"] != 1 else 0
    s["color_description_present"] = r.f(1)
    if s["color_description_present"]:
        s["color_primaries"] = r.f(8)
        s["transfer_characteristics"] = r.f(8)
        s["matrix_coefficients"] = r.f(8)
    else:
        s["color_primaries"] = s["transfer_characteristics"] = s["matrix_coefficients"] = 2
    if s["monochrome"]:
        s["color_range"] = r.f(1)
    elif (s["color_primaries"] == 1 and s["transfer_characteristics"] == 13
          and s["matrix_coefficients"] == 0):
        pass
    else:
        s["color_range"] = r.f(1)
        if s["seq_profile"] == 0:
            pass  # 4:2:0
        s["chroma_sample_position"] = r.f(2)
    if not s["monochrome"]:
        s["separate_uv_delta_q"] = r.f(1)
    s["film_grain_params_present"] = r.f(1)
    return s


def parse_frame_header_intra(data: bytes, seq: dict) -> tuple:
    """Parse an intra (KEY) frame header; returns (dict, bit_position)."""
    r = BitReader(data)
    f = {}
    reduced = seq["reduced_still_picture_header"]
    if reduced:
        f["frame_type"] = 0
        f["show_frame"] = 1
    else:
        f["show_existing_frame"] = r.f(1)
        assert not f["show_existing_frame"]
        f["frame_type"] = r.f(2)
        f["show_frame"] = r.f(1)
        if not f["show_frame"]:
            f["showable_frame"] = r.f(1)
        is_key_shown = f["frame_type"] == 0 and f["show_frame"]
        if f["frame_type"] == 3:
            f["error_resilient"] = 1
        elif not is_key_shown:
            f["error_resilient"] = r.f(1)
    f["disable_cdf_update"] = r.f(1)
    if seq["seq_force_screen_content_tools"] == 2:
        f["allow_screen_content_tools"] = r.f(1)
    else:
        f["allow_screen_content_tools"] = seq["seq_force_screen_content_tools"]
    if f["allow_screen_content_tools"] and seq["seq_force_integer_mv"] == 2:
        f["force_integer_mv"] = r.f(1)
    if not reduced:
        f["frame_size_override"] = r.f(1)
        if seq["enable_order_hint"]:
            f["order_hint"] = r.f(seq["order_hint_bits"])
        # intra: no primary_ref_frame
    else:
        f["frame_size_override"] = 0
    assert f["frame_type"] in (0, 2), "intra parser"
    if not reduced and not f["show_frame"]:
        f["refresh_frame_flags"] = r.f(8)
    # frame_size
    if f["frame_size_override"]:
        wb = seq["max_frame_width"].bit_length()
        f["frame_width"] = r.f(wb) + 1  # approximation; not used in v0
    else:
        f["frame_width"] = seq["max_frame_width"]
        f["frame_height"] = seq["max_frame_height"]
    if seq["enable_superres"]:
        f["use_superres"] = r.f(1)
        if f["use_superres"]:
            f["superres_denom"] = r.f(3) + 9
    f["render_size_different"] = r.f(1)
    if f["render_size_different"]:
        f["render_width"] = r.f(16) + 1
        f["render_height"] = r.f(16) + 1
    if f["allow_screen_content_tools"]:  # && UpscaledWidth == FrameWidth
        f["allow_intrabc"] = r.f(1)
    if not reduced and not f["disable_cdf_update"]:
        f["disable_frame_end_update_cdf"] = r.f(1)
    # tile info
    sb_shift = 7 if seq["use_128x128_superblock"] else 6
    sb_cols = (f["frame_width"] + (1 << sb_shift) - 1) >> sb_shift
    sb_rows = (f["frame_height"] + (1 << sb_shift) - 1) >> sb_shift

    def tile_log2(blk, target):
        k = 0
        while (blk << k) < target:
            k += 1
        return k

    max_tile_width_sb = 4096 >> sb_shift
    max_tile_area_sb = (4096 * 2304) >> (2 * sb_shift)
    min_log2_cols = tile_log2(max_tile_width_sb, sb_cols)
    max_log2_cols = tile_log2(1, min(sb_cols, 64))
    max_log2_rows = tile_log2(1, min(sb_rows, 64))
    min_log2_tiles = max(min_log2_cols, tile_log2(max_tile_area_sb, sb_rows * sb_cols))
    f["uniform_tile_spacing"] = r.f(1)
    assert f["uniform_tile_spacing"], "only uniform tiles in v0 parser"
    tcl = min_log2_cols
    while tcl < max_log2_cols and r.f(1):
        tcl += 1
    trl = max(min_log2_tiles - tcl, 0)
    while trl < max_log2_rows and r.f(1):
        trl += 1
    f["tile_cols_log2"], f["tile_rows_log2"] = tcl, trl
    if tcl or trl:
        f["context_update_tile_id"] = r.f(tcl + trl)
        f["tile_size_bytes"] = r.f(2) + 1
    # quantization
    f["base_q_idx"] = r.f(8)

    def delta_q():
        if r.f(1):
            v = r.f(7)
            return v - 128 if v & 64 else v
        return 0

    f["y_dc_delta_q"] = delta_q()
    if not seq["monochrome"]:
        diff_uv = r.f(1) if seq.get("separate_uv_delta_q") else 0
        f["u_dc_delta_q"] = delta_q()
        f["u_ac_delta_q"] = delta_q()
        if diff_uv:
            f["v_dc_delta_q"] = delta_q()
            f["v_ac_delta_q"] = delta_q()
    f["using_qmatrix"] = r.f(1)
    if f["using_qmatrix"]:
        f["qm_y"] = r.f(4)
        f["qm_u"] = r.f(4)
        if not seq["monochrome"] and seq.get("separate_uv_delta_q"):
            f["qm_v"] = r.f(4)
    f["segmentation_enabled"] = r.f(1)
    assert not f["segmentation_enabled"], "v0 parser"
    if f["base_q_idx"] > 0:
        f["delta_q_present"] = r.f(1)
        if f["delta_q_present"]:
            f["delta_q_res"] = r.f(2)
            f["delta_lf_present"] = r.f(1)
            if f["delta_lf_present"]:
                f["delta_lf_res"] = r.f(2)
                f["delta_lf_multi"] = r.f(1)
    # loop filter (not coded lossless / intrabc in v0)
    if not f.get("allow_intrabc"):
        f["filter_level"] = [r.f(6), r.f(6)]
        if not seq["monochrome"] and any(f["filter_level"]):
            f["filter_level_uv"] = [r.f(6), r.f(6)]
        f["sharpness"] = r.f(3)
        f["lf_delta_enabled"] = r.f(1)
        if f["lf_delta_enabled"]:
            if r.f(1):  # update
                for _ in range(8):
                    if r.f(1):
                        r.f(7)
                for _ in range(2):
                    if r.f(1):
                        r.f(7)
        if seq["enable_cdef"]:
            f["cdef_damping"] = r.f(2) + 3
            bits = r.f(2)
            f["cdef_bits"] = bits
            f["cdef_y"] = [(r.f(4), r.f(2)) for _ in range(1 << bits)]
            if not seq["monochrome"]:
                f["cdef_uv"] = [(r.f(4), r.f(2)) for _ in range(1 << bits)]
        if seq["enable_restoration"]:
            kinds = [r.f(2) for _ in range(1 if seq["monochrome"] else 3)]
            f["lr_type"] = kinds
            if any(kinds):
                raise NotImplementedError("lr sizes")
    f["tx_mode_select"] = r.f(1)
    f["reduced_tx_set"] = r.f(1)
    if seq["film_grain_params_present"] and f["show_frame"]:
        f["apply_grain"] = r.f(1)
    f["_bitpos"] = r._pos
    return f, r._pos
