"""The bench's printed line must fit the driver's stdout-tail capture.

BENCH_r03 and BENCH_r04 both recorded ``"parsed": null`` because the final
printed JSON line outgrew the driver's tail window — measured at exactly
2000 bytes (both recorded tails are len 2000 and begin mid-object). These
tests pin the slim line produced by ``bench._slim_line`` to well under
that window with WORST-CASE inputs: the longest real query names, maximal
float widths, and every optional section present.
"""

from __future__ import annotations

import json

import bench


def _worst_case_out() -> dict:
    # every headline query present, walls at worst-case float width after
    # the slim line's round(, 2) — five digits before the point
    timings = {name: 99999.99 for name in bench.HEADLINE}
    timings["transcript_pipeline"] = 99999.99
    return {
        "metric": "headline_query_wall_clock_total",
        "value": 999999.999,
        "unit": "sec",
        "queries": timings,
        "sf": "/root/testdata/sf0.1",
        "headline_passes": [
            {"wall_sec": 99999.999, "external_cores": 31.99},
            {"wall_sec": 99999.999, "external_cores": 31.87},
        ],
        "pipeline": {
            "n_turns": 99_999_999,
            "wall_sec": 99999.999,
            "turns_per_sec": 999999.9,
            "cpus": 32,
        },
        "pipeline_full": {
            "n_turns": 99_999_999,
            "lm_train_wall_sec": 99999.999,
            "wall_sec": 99999.999,
            "turns_per_sec": 999999.9,
            "gates": ["heuristics", "lm_perplexity", "agent_loop"],
            "cpus": 32,
        },
        "conv_pack": {
            "n_turns": 99_999_999,
            "train_wall_sec": 99999.999,
            "wall_sec": 99999.999,
            "n_seqs": 99_999_999,
            "n_tokens": 9_999_999_999,
            "assistant_token_frac": 0.9999,
            "turns_per_sec": 999999.9,
            "external_cores": 31.99,
        },
        "docs_large": {"anything": {"wall_sec": 99999.999}},
        "docs_shared": {"anything": {"wall_sec": 99999.999}},
        "scaling": {
            "corpus_turns": 99_999_999,
            "cpus_small": 16,
            "cpus_big": 64,
            "turns_per_sec_small": 999999.9,
            "turns_per_sec_big": 9999999.9,
            "speedup": 3.999,
            "efficiency": 0.999,
            "external_cores_per_window": [[31.9] * 3] * 6,
            "host_loadavg_per_window": [99.99] * 6,
            "samples_turns_per_sec": [("big", 999999.9)] * 6,
        },
    }


def test_slim_line_fits_driver_tail_window():
    slim = bench._slim_line(_worst_case_out())
    line = json.dumps(slim, separators=(",", ":"))
    # driver tail = 2000 bytes; leave headroom for a trailing newline and
    # any stray preceding output sharing the window
    assert len(line) < 1500, (len(line), line)


def test_slim_line_survives_tail_truncation_and_keeps_headline():
    """Simulate the driver: print noise + the slim line, keep the LAST
    2000 bytes, parse the last line — the full summary must survive."""
    slim = bench._slim_line(_worst_case_out())
    line = json.dumps(slim, separators=(",", ":"))
    stdout = ("x" * 5000) + "\n" + line + "\n"
    tail = stdout[-2000:]
    parsed = json.loads(tail.strip().splitlines()[-1])
    assert parsed["metric"] == "headline_query_wall_clock_total"
    assert parsed["value"] == 999999.999
    assert parsed["n_queries"] == len(bench.HEADLINE) + 1
    assert len(parsed["queries"]) == 10
    assert parsed["scaling"]["efficiency"] == 0.999
    assert parsed["pipeline_turns_per_sec"] == 999999.9
    assert parsed["min_pass_external_cores"] == 31.87
    assert parsed["detail"] == "BENCH_DETAIL.json"


def test_slim_line_handles_missing_optional_sections():
    out = _worst_case_out()
    out["scaling"] = None
    out["docs_large"] = None
    out["docs_shared"] = None
    out["pipeline_full"] = None
    out["conv_pack"] = None
    out["headline_passes"] = []
    slim = bench._slim_line(out)
    line = json.dumps(slim, separators=(",", ":"))
    assert len(line) < 1500
    assert "scaling" not in slim
    assert "min_pass_external_cores" not in slim
