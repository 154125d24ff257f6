"""Report sinks (SURVEY §2.1 S6-S10).

The reference emits Excel (openpyxl), PowerPoint (python-pptx) and PNG
timelines (matplotlib) on the driver after collecting per-condition results
(analysis_collection.py:195-231, cond_collection.py:205-401,
condition.py:448-554). Those libraries are absent in this container, so each
rich sink has a dependency-free native implementation (the library is used
when importable); structured CSV/JSON fallbacks carrying the same content
also remain:

- S6 Excel summary      → write_summary_excel (openpyxl OR the built-in
  xlsx codec, sources.xlsx_codec) / write_summary_csv
- S7 PowerPoint deck    → write_pptx (built-in PresentationML writer,
  sinks_pptx: one slide per condition with validity table + timeline PNG)
- S8 PNG timeline Gantt → write_timeline_png (matplotlib OR the built-in
  rasterizer sinks_png) / timeline_rows (the exact broken_barh segments +
  colors the reference draws: red=true #f03b20, blue=false #2b83ba,
  grey=NULL #bababa — condition.py:448-554)
- S9 JSON error tree    → write_error_json (runner.error_tree → json)
- S10 log sink          → stdlib logging, configured in setup_logging

All sinks are driver-side by design: they consume the one-row summaries and
small per-condition range tables (10²-10⁴ rows) — never raw observations —
so report generation is O(conditions), independent of data scale.
"""

from __future__ import annotations

import csv
import json
import logging
from pathlib import Path

#: Summary columns, matching the reference's Excel sheet row
#: (cond_collection.py:215-248 / FIXTURES.md §5).
SUMMARY_COLUMNS = [
    "site",
    "master_alias",
    "condition",
    "data_from",
    "data_until",
    "percentage_valid",
    "percentage_notvalid",
    "percentage_nodata",
    "rows",
]

#: Timeline colors (condition.py:452-455).
COLOR_TRUE = "#f03b20"
COLOR_FALSE = "#2b83ba"
COLOR_NULL = "#bababa"


def summary_rows(results: dict) -> list[dict]:
    """Flatten runner results → one summary dict per condition."""
    out = []
    for cid, res in results.items():
        spec = res.spec
        if res.summary is None:
            out.append(
                {
                    "site": spec.site,
                    "master_alias": spec.master_alias,
                    "condition": spec.raw_condition,
                    "data_from": None,
                    "data_until": None,
                    "percentage_valid": None,
                    "percentage_notvalid": None,
                    "percentage_nodata": None,
                    "rows": 0,
                }
            )
            continue
        s = res.summary.collect()[0]
        n_rows = res.ranges.count() if res.ranges is not None else 0
        out.append(
            {
                "site": spec.site,
                "master_alias": spec.master_alias,
                "condition": spec.raw_condition,
                "data_from": s.data_from,
                "data_until": s.data_until,
                "percentage_valid": s.percentage_valid,
                "percentage_notvalid": s.percentage_notvalid,
                "percentage_nodata": s.percentage_nodata,
                "rows": n_rows,
            }
        )
    return out


def write_summary_csv(results: dict, path: str) -> str:
    """S6 fallback: the per-collection summary sheet as CSV."""
    rows = summary_rows(results)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=SUMMARY_COLUMNS)
        w.writeheader()
        w.writerows(rows)
    return path


def write_summary_excel(results: dict, path: str, *, analysis_name: str = "") -> str:
    """S6: Excel workbook — INFO sheet + one summary sheet, with the
    reference's ``0.00 %`` number format on the percentage columns
    (analysis_collection.py:195-231).

    Uses openpyxl when present; otherwise the built-in dependency-free
    codec (sources.xlsx_codec) — a real .xlsx is produced either way."""
    rows = summary_rows(results)
    try:
        import openpyxl
    except ImportError:
        from tsatool_app_spark.sources.xlsx_codec import STYLE_PERCENT, write_xlsx

        pct_cols = {
            SUMMARY_COLUMNS.index(c): STYLE_PERCENT
            for c in ("percentage_valid", "percentage_notvalid", "percentage_nodata")
        }
        return write_xlsx(
            path,
            {
                "INFO": [["Analysis", analysis_name]],
                "summary": [SUMMARY_COLUMNS]
                + [[row[c] for c in SUMMARY_COLUMNS] for row in rows],
            },
            column_styles={"summary": pct_cols},
        )
    wb = openpyxl.Workbook()
    info = wb.active
    info.title = "INFO"
    info["A1"] = "Analysis"
    info["B1"] = analysis_name
    sheet = wb.create_sheet("summary")
    sheet.append(SUMMARY_COLUMNS)
    for row in rows:
        sheet.append([row[c] for c in SUMMARY_COLUMNS])
    for cell in sheet["F2":f"H{sheet.max_row}"] if sheet.max_row > 1 else []:
        for c in cell:
            c.number_format = "0.00 %"
    wb.save(path)
    return path


def timeline_rows(cond_result) -> list[dict]:
    """S8 content: the Gantt segments the reference draws — one row per
    (series, vfrom, vuntil, state, color), series = each block alias +
    'master'. Render-ready for any plotting backend."""
    if cond_result.ranges is None:
        return []
    aliases = [
        c for c in cond_result.ranges.columns
        if c not in ("vfrom", "vuntil", "vdiff_s", "master")
    ]
    rows = []
    for r in cond_result.ranges.orderBy("vfrom").collect():
        for series in aliases + ["master"]:
            val = r[series]
            rows.append(
                {
                    "series": series,
                    "vfrom": r.vfrom,
                    "vuntil": r.vuntil,
                    "state": val,
                    "color": COLOR_TRUE if val is True else COLOR_FALSE if val is False else COLOR_NULL,
                }
            )
    return rows


def write_timeline_json(cond_result, path: str) -> str:
    """S8 fallback: timeline segments as JSON (default=str for timestamps)."""
    with open(path, "w") as f:
        json.dump(timeline_rows(cond_result), f, default=str, indent=1)
    return path


def write_timeline_png(cond_result, path: str) -> str:
    """S8: the per-condition validity Gantt as a real PNG
    (condition.py:448-554 broken_barh figure).

    matplotlib renders it when present; otherwise the built-in rasterizer
    (sinks_png.render_timeline_png — stdlib zlib PNG, same segments, same
    colors, 5×7 bitmap labels)."""
    try:
        import matplotlib
    except ImportError:
        from tsatool_app_spark.sinks_png import render_timeline_png

        with open(path, "wb") as f:
            f.write(render_timeline_png(timeline_rows(cond_result)))
        return path
    matplotlib.use("Agg")
    import matplotlib.dates as mdates
    import matplotlib.pyplot as plt

    rows = timeline_rows(cond_result)
    series = list(dict.fromkeys(r["series"] for r in rows))
    fig, ax = plt.subplots(figsize=(12, 0.6 * len(series) + 1))
    for i, s in enumerate(series):
        segs = [r for r in rows if r["series"] == s]
        ax.broken_barh(
            [(mdates.date2num(r["vfrom"]), mdates.date2num(r["vuntil"]) - mdates.date2num(r["vfrom"])) for r in segs],
            (i - 0.4, 0.8),
            facecolors=[r["color"] for r in segs],
        )
    ax.set_yticks(range(len(series)), series)
    ax.xaxis_date()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
    return path


def write_pptx(results: dict, path: str, template: str | None = None) -> str:
    """S7: one slide per condition, matching the reference's deck contract
    (cond_collection.py:257-401): title, condition text, time range,
    validity table, errors, timeline image.

    Rendered with the built-in dependency-free PresentationML writer
    (sinks_pptx) — a real .pptx with real tables and the S8 timeline PNG
    embedded per slide. With ``template`` (the reference's
    report_template.pptx role), the template's master/layout/theme parts
    are cloned into the deck so user branding survives; otherwise the
    built-in minimal master/theme is used."""
    from tsatool_app_spark.sinks_png import render_timeline_png
    from tsatool_app_spark.sinks_pptx import write_pptx_deck

    slides = []
    for cid, res in results.items():
        spec = res.spec
        lines = [f"Condition: {spec.raw_condition}"]
        table = None
        png = None
        if res.summary is not None:
            s = res.summary.collect()[0]

            # A condition that matched no rows (or tottime_s == 0, x/0 →
            # NULL in Spark) yields NULL data_from/until and percentages —
            # render "n/a" instead of crashing the deck on a no-data slide.
            def _pct(v):
                return "n/a" if v is None else f"{v:.2f} %"

            def _sec(v):
                return "n/a" if v is None else str(v)

            if s.data_from is None and s.data_until is None:
                lines.append("Data range: n/a")
            else:
                lines.append(f"Data range: {s.data_from} - {s.data_until}")
            table = [
                ["", "seconds", "percent"],
                ["valid", _sec(s.tottime_valid_s), _pct(s.percentage_valid)],
                ["not valid", _sec(s.tottime_notvalid_s), _pct(s.percentage_notvalid)],
                ["no data", _sec(s.tottime_nodata_s), _pct(s.percentage_nodata)],
            ]
        else:
            lines.append("No result (condition not run)")
        err_coll = getattr(spec, "errors", None)
        for msg in (err_coll.messages if err_coll else [])[:5]:
            lines.append(f"Error: {msg}")
        if res.ranges is not None:
            png = render_timeline_png(timeline_rows(res))
        slides.append({"title": cid, "lines": lines, "table": table, "png": png})
    return write_pptx_deck(path, slides, template_path=template)


def write_error_json(analysis, path: str) -> str:
    """S9: nested error tree → <name>_ERRORS.json (tsabatch.py:93-104)."""
    with open(path, "w") as f:
        json.dump(analysis.error_tree(), f, indent=1, default=str)
    return path


def setup_logging(name: str, results_dir: str = ".", level: int = logging.INFO) -> logging.Logger:
    """S10: file + console logging, results/<name>.log (tsabatch.py:54-79)."""
    log = logging.getLogger("tsatool_app_spark")
    log.setLevel(level)
    Path(results_dir).mkdir(parents=True, exist_ok=True)
    fh = logging.FileHandler(Path(results_dir) / f"{name}.log")
    fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s"))
    log.addHandler(fh)
    return log
