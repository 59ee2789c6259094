#!/usr/bin/env python3
"""Machine-check SURVEY.md §2 operator parity against the driver gate.

Each §2 row is encoded here as (section, op, query_ids, where). The
audit loads the newest CORRECTNESS_r*.json (or a path given as argv[1]),
then FAILS if any mapped query id is absent from the registry key set or
not fully green (rows+schema+hash, err null). Rows with no gating query
must say why in `ungated` — anything else with an empty id list fails.

On success it rewrites the section of COVERAGE.md between the
COVERAGE-AUDIT sentinels with the generated table, so the §2 parity
claim in the narrative is always the machine-checked one.

Run in the round-close sweep:  python3 tools/coverage_audit.py
"""
import glob
import json
import re
import sys

# (section, op, [query ids], where) — one entry per SURVEY §2 row.
# `ungated:<reason>` as the sole "id" marks a documented non-query row.
ROWS = [
    # 2.1 sources / sinks
    ("2.1", "open_dataset (parquet et al.)", ["q01_agg_partial"],
     "model/XDataset.scala, io/Tables.scala"),
    ("2.1", "netCDF classic CDF-1/2/5 read+write",
     ["q115_netcdf_roundtrip", "q115b_netcdf_cdf5", "q236_nc_open_dataset"],
     "io/NetCDF.scala"),
    ("2.1", "netCDF-4 / HDF5 native read",
     ["q168_netcdf4_roundtrip", "q169_netcdf4_dense", "q231_hdf5_szip",
      "q232_hdf5_lzf", "q233_hdf5_v4fixed",
      "q235_h5_open_dataset", "q295_hdf5_extensible_array",
      "q354_hdf5_nbit_scaleoffset",
      "q371_hdf5_nbit_bigendian", "q389_hdf5_swizzled_ea"],
     "io/HDF5.scala, io/NbitSO.scala"),
    ("2.1", "pydap / OPeNDAP",
     ["ungated:documented non-goal (SURVEY §7.5) — network protocol"],
     "—"),
    ("2.1", "open_dataarray", ["q223_open_dataarray"], "model/XDataset.scala"),
    ("2.1", "open_datatree / open_groups",
     ["q117_datatree_map", "q153_datatree_zarr"], "model/DataTree.scala"),
    ("2.1", "open_mfdataset + combine", ["q82_mfopen_combine"],
     "io/Backends.scala"),
    ("2.1", "load_* (eager)", ["q224_load_eager"], "model/XDataset.scala"),
    ("2.1", "to_netcdf", ["q195_to_netcdf"], "io/NetCDF.scala"),
    ("2.1", "to_zarr v2/v3 (region/append/consolidated/sharding)",
     ["q135_zarr_roundtrip", "q152_zarr_v3", "q205_zarr_sharded",
      "q222_zarr_blosc", "q234_zarr_nested_zstd", "q247_zarr_transpose",
      "q296_zarr_bitshuffle"],
     "io/Zarr.scala, io/Blosc.scala"),
    ("2.1", "save_mfdataset", ["q180_save_mfdataset"], "io/Store.scala"),
    ("2.1", "backend plugin registry", ["q192_backend_dispatch"],
     "io/Backends.scala"),
    ("2.1", "from/to_dataframe, to_pandas", ["q226_to_dataframe"],
     "identity by design"),
    ("2.1", "to_dict / from_dict", ["q179_dict_roundtrip"],
     "io/DictIO.scala"),
    ("2.1", "CF decoding pipeline", ["q77_cf_decode"], "io/CFDecode.scala"),
    ("2.1", "CSV sink->source roundtrip (ext.)", ["q359_csv_roundtrip"],
     "queries/QueriesMore.scala"),
    ("2.1", "NumPy .npy/.npz read+write (ext.)", ["q383_npz_roundtrip"],
     "io/Npy.scala"),
    ("2.1", "ORC sink->source roundtrip (ext.)", ["q384_orc_roundtrip"],
     "native spark.read/write.orc"),
    # 2.2 projection / filter / selection
    ("2.2", "select / drop_vars / drop_dims",
     ["q01_agg_partial", "q171_drop_vars"], "model/XDataset.scala"),
    ("2.2", "isel / head / thin",
     ["q03_isel_head", "q06_thin"], "model/Positions.scala"),
    ("2.2", "sel exact / slice", ["q02_sel_slice", "q05_isin"],
     "model/XDataset.scala"),
    ("2.2", "sel method= (nearest/ffill/bfill + tolerance)",
     ["q16_asof_backward", "q16b_asof_forward"], "align/AsOf.scala"),
    ("2.2", "vectorized sel", ["q123_sel_points"],
     "model/XDataset.scala"),
    ("2.2", "loc", ["q225_loc"], "model/XDataset.scala"),
    ("2.2", "tail", ["q65_tail"], "model/Positions.scala"),
    ("2.2", "squeeze", ["q172_squeeze"], "model/XDataset.scala"),
    ("2.2", "drop_sel / drop_isel", ["q66_drop_sel", "q186_drop_isel"],
     "model/XDataset.scala"),
    ("2.2", "where-mask / where-drop", ["q04_where_mask", "q101_where_drop"],
     "model/XDataset.scala"),
    ("2.2", "isin", ["q05_isin"], "model/XDataset.scala"),
    ("2.2", "query (string expr)", ["q09_query_expr"], "native expr()"),
    ("2.2", "eval", ["q81_eval_assign"], "native selectExpr"),
    ("2.2", "filter_by_attrs", ["q173_filter_by_attrs"],
     "model/DatasetMeta.scala"),
    ("2.2", "dropna / fillna", ["q07_fillna", "q105_dropna_thresh"],
     "model/XDataset.scala"),
    ("2.2", "drop_duplicates", ["q50_dedup_exact", "q86_drop_duplicates"],
     "model/XDataset.scala"),
    # 2.3 joins / alignment
    ("2.3", "align inner/outer/left/right/override/exact",
     ["q10_align_inner", "q11_align_outer", "q250_align_left_right",
      "q100_align_override"], "align/AlignSpec + align/Align.scala"),
    ("2.3", "binary-op auto-align", ["q13_broadcast_binop"],
     "model/XDataset.scala"),
    ("2.3", "reindex / reindex_like",
     ["q12_reindex_time", "q256_reindex_like", "q71_upsample_ffill"],
     "align/Align.scala"),
    ("2.3", "broadcast / broadcast_like",
     ["q35_expand_dims", "q258_broadcast_like"], "align/Align.scala"),
    ("2.3", "merge", ["q14_merge_outer"], "align/Merge.scala"),
    ("2.3", "update", ["q87_update"], "align/Merge.scala"),
    ("2.3", "combine_first", ["q15_combine_first"], "align/Merge.scala"),
    ("2.3", "as-of +-tolerance", ["q16_asof_backward", "q16b_asof_forward"],
     "align/AsOf.scala"),
    ("2.3", "interp / interp_like",
     ["q45_interp_linear", "q83_interp_nearest", "q257_interp_like"],
     "numerics/Numerics.scala"),
    ("2.3", "NDPointIndex KNN", ["q120_ndpoint_knn"],
     "align/NDPointIndex (grid-bucketed)"),
    # 2.4 aggregations
    ("2.4", "reductions (sum/mean/min/max/count)",
     ["q01_agg_partial", "q73_prod_all_any"], "agg/"),
    ("2.4", "std / var / prod", ["q40_cov_corr"], "agg/"),
    ("2.4", "median / quantile + all 9 H&F methods",
     ["q24_quantile", "q62_quantile_hf", "q62b_quantile_vec"],
     "exprs/HFQuantile.scala"),
    ("2.4", "weighted family",
     ["q21_weighted_mean", "q21b_weighted_var", "q85_weighted_quantile"],
     "agg/Weighted.scala"),
    ("2.4", "cumsum / cumprod",
     ["q26_cumsum", "q91_cumprod", "q134_cumprod_signed"], "window/"),
    ("2.4", "argmin / argmax / idxmin / idxmax",
     ["q74_argmax_pos", "q23_idxmax"], "agg/"),
    ("2.4", "rank (avg-tie, pct)", ["q25_rank_avg", "q75_rank_pct"],
     "agg/Rank.scala"),
    ("2.4", "groupby + composed groupers (Unique/Bin/Time/Season)",
     ["q17_resample_month", "q18_season_groupby", "q19_bins_groupby",
      "q166_season_resample"], "agg/Groupers.scala"),
    ("2.4", "resample origin/closed", ["q103_resample_origin"],
     "agg/Groupers.scala"),
    ("2.4", "qcut", ["q128_qcut"], "agg/Groupers.scala"),
    ("2.4", "groupby arithmetic", ["q20_groupby_anomaly"], "agg/"),
    ("2.4", "groupby map/first/last/quantile",
     ["q60_apply_ufunc_zscore", "q72_first_last", "q62_quantile_hf"],
     "agg/"),
    ("2.4", "resample-up asfreq/ffill/bfill/nearest/interpolate",
     ["q71_upsample_ffill", "q212_upsample_bfill", "q216_upsample_nearest",
      "q251_upsample_interpolate"], "align/Align.scala"),
    ("2.4", "min_count / skipna", ["q22_skipna_mincount"], "agg/"),
    ("2.4", "cube / rollup (ext.)", ["q161_corpus_cube"], "native cube"),
    ("2.4", "approx distinct (ext.)", ["q182_approx_distinct"],
     "native approx_count_distinct"),
    ("2.4", "reduce (custom fn)", ["q176_dataset_reduce", "q177_groupby_coord"],
     "model/XDataset.scala"),
    ("2.4", "salted skew agg (ext.)", ["q175_salted_agg"], "agg/Salt.scala"),
    # 2.5 windows / moving
    ("2.5", "rolling mean/sum/min/max/count",
     ["q27_rolling_mean", "q27b_rolling_center", "q104_rolling_median",
      "q125_rolling_stats", "q88_rolling_2d"],
     "window/Windows.scala"),
    ("2.5", "rolling.construct", ["q69_rolling_construct", "q69b_construct_stride"],
     "window/Windows.scala"),
    ("2.5", "rolling.reduce", ["q160_rolling_reduce"], "window/Windows.scala"),
    ("2.5", "EWM mean/sum/var/std/cov/corr + time-halflife",
     ["q61_ewm_mean", "q61b_ewm_sum", "q61c_ewm_var", "q61d_ewm_cov",
      "q61e_ewm_std", "q61f_ewm_noadjust", "q61g_ewm_ignorena",
      "q202_ewm_halflife"], "exprs/Ewm.scala"),
    ("2.5", "cumulative ops", ["q70_cummax"], "window/"),
    ("2.5", "coarsen + construct", ["q30_coarsen", "q141_coarsen_construct"],
     "window/Coarsen.scala"),
    ("2.5", "shift / diff", ["q28_shift_diff"], "window/"),
    ("2.5", "roll (circular)", ["q68_roll"], "window/"),
    ("2.5", "pad (all 10 modes)", ["q67_pad", "q106_pad_stat"],
     "window/Pad.scala"),
    ("2.5", "ffill / bfill +-limit", ["q29_ffill", "q29b_bfill_limit"],
     "window/"),
    ("2.5", "ranking-window extension", ["q194_ranking_windows"], "window/"),
    # 2.6 sorts / top-k
    ("2.6", "sortby", ["q98_sortby_positions"], "model/Positions.scala"),
    ("2.6", "head/tail/thin", ["q03_isel_head", "q65_tail", "q06_thin"],
     "model/Positions.scala"),
    ("2.6", "top-k", ["q08_topk"], "native TakeOrdered"),
    # 2.7 set-like / combining
    ("2.7", "concat", ["q31_concat_newdim"], "combine/Concat.scala"),
    ("2.7", "combine_nested", ["q102_combine_nested"], "combine/"),
    ("2.7", "combine_by_coords", ["q82_mfopen_combine"], "combine/"),
    ("2.7", "unify_chunks", ["q228_unify_chunks"], "model/Chunks.scala"),
    ("2.7", "intersect / except (ext.)", ["q80_intersect_except"], "native"),
    ("2.7", "equals / identical", ["q181_equals_identical"],
     "model/XDataset.scala"),
    ("2.7", "bucketed co-located join (ext.)", ["q187_bucketed_join"],
     "BucketingSpec (zero-Exchange proof)"),
    # 2.8 reshape / broadcast / stack
    ("2.8", "broadcast-by-name", ["q13_broadcast_binop", "q35_expand_dims"],
     "align/"),
    ("2.8", "transpose", ["q183_transpose_dims"], "model/XDataset.scala"),
    ("2.8", "expand_dims", ["q35_expand_dims"], "model/XDataset.scala"),
    ("2.8", "stack / unstack", ["q34_stack_roundtrip", "q32_unstack_pivot"],
     "reshape/Stack.scala"),
    ("2.8", "MultiIndex partial sel", ["q116_multiindex_sel"],
     "reshape/Stack.scala"),
    ("2.8", "to_stacked_array", ["q33_melt"],
     "reshape/Stack.scala"),
    ("2.8", "swap_dims / rename / set_index",
     ["q174_rename", "q193_meta_verbs"], "model/XDataset.scala"),
    ("2.8", "set_xindex (custom index)", ["q185_xindex_range_sel", "q241_lazy_range_index"],
     "model/Indexes.scala"),
    ("2.8", "set/reset_coords", ["q193_meta_verbs"],
     "model/XDataset.scala"),
    ("2.8", "map / pipe", ["q184_map_pipe"], "model/XDataset.scala"),
    ("2.8", "drop_attrs / drop_encoding / info",
     ["ungated:meta-only by nature — unit-tested (no data output to hash)"],
     "model/DatasetMeta.scala"),
    # 2.9 scalar functions
    ("2.9", "arithmetic / comparison / bitwise", ["q13_broadcast_binop"],
     "native"),
    ("2.9", "ufunc batteries",
     ["q76_ufunc_battery", "q129_ufunc_battery2", "q162_ufunc_battery3",
      "q163_ufunc_battery4", "q284_ufunc_battery5"], "native functions"),
    ("2.9", ".str accessor (60 methods)",
     ["q36_str_battery", "q121_str_tail", "q285_str_tail3"],
     "functions/StrAccessor.scala"),
    ("2.9", ".dt accessor (44 methods)",
     ["q37_dt_battery", "q122_dt_tail", "q165_dt_tail2"],
     "functions/DtAccessor.scala"),
    ("2.9", "astype/isnull/fillna/clip/round + 3-arg where + full_like",
     ["q38_scalar_ops"], "native"),
    ("2.9", "array/map/json helpers (ext.)", ["q217_json_array_map"],
     "native"),
    ("2.9", "CF coding + date_range(+_like) + infer_freq",
     ["q39_date_range_infer", "q77_cf_decode", "q170b_cftime_range_freqs",
      "q237_date_range_like"], "functions/Calendars.scala"),
    ("2.9", "cftime calendars",
     ["q119_cftime_calendars", "q170_cftime_proleptic", "q124_interp_calendar"],
     "functions/Calendars.scala"),
    # 2.10 numerics / interpolation
    ("2.10", "dot / einsum", ["q47_dot", "q130_einsum3"],
     "numerics/"),
    ("2.10", "cov / corr", ["q40_cov_corr", "q211_autocorr"],
     "numerics/"),
    ("2.10", "cross", ["q78_cross"], "numerics/"),
    ("2.10", "polyval / polyfit",
     ["q41_polyval", "q42_polyfit", "q84_polyfit2",
      "q132_polyfit_weighted", "q118_polyfit3_cov"],
     "numerics/Numerics.scala"),
    ("2.10", "detrend (ext.)", ["q213_detrend"], "numerics/"),
    ("2.10", "curvefit", ["q90_curvefit"], "numerics/Numerics.scala"),
    ("2.10", "differentiate", ["q43_differentiate", "q43b_differentiate_edge2"],
     "numerics/"),
    ("2.10", "integrate / cumulative_integrate",
     ["q44_integrate", "q79_cumulative_integrate", "q137_cumulative_integrate"],
     "numerics/"),
    ("2.10", "all 13 interp methods + extrapolate + 2-D",
     ["q45_interp_linear", "q83_interp_nearest", "q89_spline_cubic",
      "q93_interp_pchip", "q96_interp_akima", "q107_interp_makima",
      "q108_interp_zero", "q109_interp_slinear", "q110_interp_quadratic",
      "q111_interp_quintic", "q112_interp_polynomial", "q113_interp_barycentric",
      "q114_interp_krogh", "q159_interp_extrapolate", "q140_interp_2d"],
     "numerics/Interp.scala"),
    ("2.10", "interpolate_na", ["q46_interpolate_na", "q46b_interpolate_na_limit"],
     "numerics/"),
    ("2.10", "map_blocks", ["q230_map_blocks"], "model/Chunks.scala"),
    ("2.10", "apply_ufunc-style reduce", ["q60_apply_ufunc_zscore"], "agg/"),
    ("2.10", "chunk / unify_chunks", ["q227_chunk", "q228_unify_chunks"],
     "model/Chunks.scala"),
    # 2.11 streaming (extension)
    ("2.11", "tumbling window agg", ["q63_stream_resample"],
     "streaming/StreamOps.scala"),
    ("2.11", "sliding window agg", ["q64b_stream_sliding"], "streaming/"),
    ("2.11", "custom state (mapGroupsWithState)", ["q196_stream_state"],
     "streaming/"),
    ("2.11", "streaming dedup", ["q99_stream_dedup"], "streaming/"),
    ("2.11", "stream-stream interval join + LEFT/FULL OUTER",
     ["q127_stream_join", "q208_stream_outer_join", "q355_stream_full_outer"],
     "streaming/StreamOps.scala"),
    ("2.11", "stream-static join", ["q206_stream_static_join"], "streaming/"),
    ("2.11", "streaming curation/sketches",
     ["q158_stream_curation", "q238_stream_lsh_filter", "q220_stream_classify",
      "q268_stream_topk", "q209_stream_file_sink", "q306_stream_countmin",
      "q317_stream_histogram"], "streaming/"),
    # 2.12 UDF surface
    ("2.12", "elementwise exprs", ["q76_ufunc_battery"], "native codegen"),
    ("2.12", "reduced-core-dim Aggregators", ["q62_quantile_hf"],
     "exprs/"),
    ("2.12", "preserved-core-dim scans", ["q26_cumsum"], "window/"),
    ("2.12", "map_blocks", ["q230_map_blocks"], "model/Chunks.scala"),
    ("2.12", "reduce-func surface", ["q62_quantile_hf", "q85_weighted_quantile"],
     "agg/"),
    ("2.12", "accessor registration", ["q229_accessor"],
     "functions/"),
    ("2.12", "custom Index plug-in", ["q185_xindex_range_sel", "q241_lazy_range_index"],
     "model/Indexes.scala"),
    ("2.12", "SQL UDF registry", ["ungated:native spark.udf.register — "
     "exercised throughout, no distinct result surface"], "native"),
]

SENT_A = "<!-- COVERAGE-AUDIT:BEGIN (generated by tools/coverage_audit.py) -->"
SENT_B = "<!-- COVERAGE-AUDIT:END -->"


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        sorted(glob.glob("CORRECTNESS_r*.json"))[-1]
    gate = json.load(open(path))

    def green(q):
        e = gate.get(q)
        return (e is not None and e.get("rows_match") and
                e.get("schema_match") and e.get("hash_match") and
                not e.get("err"))

    bad, lines, n_gated, n_ungated = [], [], 0, 0
    for sec, op, qids, where in ROWS:
        if len(qids) == 1 and qids[0].startswith("ungated:"):
            n_ungated += 1
            lines.append(f"| {sec} | {op} | — ({qids[0][8:]}) | {where} |")
            continue
        if not qids:
            bad.append(f"{sec} {op}: NO gating query and no ungated reason")
            continue
        missing = [q for q in qids if q not in gate]
        red = [q for q in qids if q in gate and not green(q)]
        if missing:
            bad.append(f"{sec} {op}: not in registry gate: {missing}")
        if red:
            bad.append(f"{sec} {op}: NOT GREEN: {red}")
        if not missing and not red:
            n_gated += 1
            lines.append(f"| {sec} | {op} | {' '.join(qids)} | {where} |")

    total = len(ROWS)
    header = [
        f"SURVEY §2 operator parity, machine-checked against {path}:",
        f"{total} rows; {n_gated} oracle-green, {n_ungated} documented",
        "ungated, 0 red (the script FAILS otherwise).", "",
        "| § | operator | gating queries (all green) | where |",
        "|---|---|---|---|"]
    table = "\n".join(header + lines)

    if bad:
        print("COVERAGE AUDIT FAILURES:")
        print("\n".join(" - " + b for b in bad))
        sys.exit(1)

    cov = open("COVERAGE.md").read()
    block = f"{SENT_A}\n{table}\n{SENT_B}"
    if SENT_A in cov:
        cov = re.sub(re.escape(SENT_A) + r".*?" + re.escape(SENT_B),
                     block, cov, flags=re.S)
    else:
        cov = cov.rstrip() + "\n\n## §2 parity table (generated)\n\n" \
            + block + "\n"
    open("COVERAGE.md", "w").write(cov)
    print(f"coverage audit OK: {total} §2 rows, {n_gated} gated green, "
          f"{n_ungated} documented ungated (gate: {path})")


if __name__ == "__main__":
    main()
