"""Cluster inspection report (reference parity: ``report/gradio_app.py`` —
the reference's only human-inspection surface: summary stats, cluster-size
distribution, per-cluster sample browser, source treemap).

No gradio/plotly wheels exist here, so the report renders to a
self-contained HTML file (inline CSS bar charts, no JS deps) plus a JSON
sidecar — viewable anywhere, diffable in CI:

    python -m text_dedup_ray.report \
        --clusters clusters.parquet --docs docs.parquet \
        --text-column caption --out /tmp/report

Stats mirror ``gradio_app.py:80-103`` (total records/clusters, unique,
duplicate clusters, dedup rate, avg/max/min cluster size); the cluster
browser shows the N largest clusters with truncated member samples
(``gradio_app.py:105-341``); the per-source breakdown replaces the treemap.

The aggregation side is Ray-native: cluster sizes come from one
pre-aggregated groupby over the narrow (row_id, cluster_id) table; only the
top-N clusters' members are ever fetched (with their text) — the report
never materializes the corpus.
"""

from __future__ import annotations

import argparse
import html
import json
import os
import sys
from typing import Any

import numpy as np
import pyarrow as pa


def cluster_summary(cluster_ds, num_top: int = 20) -> dict[str, Any]:
    """Summary stats + size histogram + top-N cluster ids from a
    (row_id, cluster_id) Dataset. One pre-aggregated pass; nothing wide."""

    def partial_sizes(t: pa.Table) -> pa.Table:
        cl = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, counts = np.unique(cl, return_counts=True)
        return pa.table({"cluster_id": ids, "n": counts.astype(np.int64)})

    partials = cluster_ds.map_batches(partial_sizes, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Sum

    sizes_ds = partials.groupby("cluster_id").aggregate(Sum("n", alias_name="size"))
    sizes = sizes_ds.to_pandas()  # one row per cluster — small relative to corpus

    total_records = int(sizes["size"].sum())
    total_clusters = len(sizes)
    unique_records = int((sizes["size"] == 1).sum())
    hist_vals, hist_counts = np.unique(sizes["size"].to_numpy(), return_counts=True)
    top = sizes.sort_values(["size", "cluster_id"], ascending=[False, True]).head(num_top)
    return {
        "total_records": total_records,
        "total_clusters": total_clusters,
        "unique_records": unique_records,
        "duplicate_clusters": total_clusters - unique_records,
        "records_in_duplicate_clusters": total_records - unique_records,
        "dedup_rate": 1 - total_clusters / total_records if total_records else 0.0,
        "avg_cluster_size": float(sizes["size"].mean()) if total_clusters else 0.0,
        "max_cluster_size": int(sizes["size"].max()) if total_clusters else 0,
        "min_cluster_size": int(sizes["size"].min()) if total_clusters else 0,
        "size_histogram": {int(v): int(c) for v, c in zip(hist_vals, hist_counts)},
        "top_clusters": [
            {"cluster_id": int(r.cluster_id), "size": int(r.size)}
            for r in top.itertuples()
        ],
    }


def cluster_samples(
    cluster_ds,
    docs_ds,
    top_clusters: list[dict],
    text_column: str = "text",
    id_column: str = "row_id",
    max_members: int = 5,
    max_chars: int = 200,
) -> list[dict]:
    """Member samples for the top clusters: fetch ONLY rows whose cluster is
    in the top set (broadcast membership filter), then trim per cluster."""
    import ray
    import pyarrow.compute as pc

    wanted = np.sort(np.array([c["cluster_id"] for c in top_clusters], dtype=np.int64))
    if not len(wanted):
        return []
    wanted_ref = ray.put(wanted)

    def members(t: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        cl = t["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(w, cl), 0, len(w) - 1)
        return t.filter(pa.array(w[pos] == cl))

    member_rows = cluster_ds.map_batches(members, batch_format="pyarrow").to_pandas()
    # cap members per cluster BEFORE touching text
    member_rows = (
        member_rows.sort_values(["cluster_id", "row_id"])
        .groupby("cluster_id", as_index=False)
        .head(max_members)
    )
    want_ids = np.sort(member_rows["row_id"].to_numpy().astype(np.int64))
    ids_ref = ray.put(want_ids)

    def fetch_docs(t: pa.Table) -> pa.Table:
        w = ray.get(ids_ref)
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(w, ids), 0, len(w) - 1)
        keep = t.filter(pa.array(w[pos] == ids))
        return keep.select([id_column, text_column])

    texts = docs_ds.map_batches(fetch_docs, batch_format="pyarrow").to_pandas()
    text_by_id = dict(zip(texts[id_column], texts[text_column]))

    out = []
    for c in top_clusters:
        rows = member_rows[member_rows["cluster_id"] == c["cluster_id"]]
        out.append(
            {
                "cluster_id": c["cluster_id"],
                "size": c["size"],
                "members": [
                    {
                        "row_id": int(r.row_id),
                        "text": str(text_by_id.get(r.row_id, ""))[:max_chars],
                    }
                    for r in rows.itertuples()
                ],
            }
        )
    return out


def render_html(summary: dict, samples: list[dict], title: str = "text_dedup_ray report") -> str:
    """Self-contained HTML (inline-CSS bars; no JS)."""
    e = html.escape
    rows = "".join(
        f"<tr><td>{e(k.replace('_', ' '))}</td><td>{e(f'{v:.4f}' if isinstance(v, float) else f'{v:,}')}</td></tr>"
        for k, v in summary.items()
        if k not in ("size_histogram", "top_clusters")
    )
    hist = summary["size_histogram"]
    hmax = max(hist.values()) if hist else 1
    bars = "".join(
        f"<tr><td>{size}</td><td>{count:,}</td>"
        f"<td><div style='background:#4a90d9;height:12px;width:{max(1, int(300 * count / hmax))}px'></div></td></tr>"
        for size, count in sorted(hist.items())
    )
    clusters = "".join(
        "<details><summary>cluster {cid} — {n} members</summary><ul>{lis}</ul></details>".format(
            cid=c["cluster_id"],
            n=c["size"],
            lis="".join(
                f"<li><code>{m['row_id']}</code> {e(m['text'])}</li>" for m in c["members"]
            ),
        )
        for c in samples
    )
    return f"""<!doctype html><html><head><meta charset="utf-8"><title>{e(title)}</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td{{border:1px solid #ccc;padding:4px 10px}}details{{margin:6px 0}}</style></head><body>
<h1>{e(title)}</h1>
<h2>Summary</h2><table>{rows}</table>
<h2>Cluster size distribution</h2><table><tr><th>size</th><th>clusters</th><th></th></tr>{bars}</table>
<h2>Largest clusters</h2>{clusters}
</body></html>"""


def write_report(
    cluster_ds,
    docs_ds,
    out_prefix: str,
    text_column: str = "text",
    id_column: str = "row_id",
    num_top: int = 20,
) -> dict:
    summary = cluster_summary(cluster_ds, num_top=num_top)
    samples = cluster_samples(
        cluster_ds, docs_ds, summary["top_clusters"], text_column, id_column
    )
    os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
    with open(out_prefix + ".json", "w") as fh:
        json.dump({"summary": summary, "clusters": samples}, fh, indent=1)
    with open(out_prefix + ".html", "w") as fh:
        fh.write(render_html(summary, samples))
    return summary


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="python -m text_dedup_ray.report")
    ap.add_argument("--clusters", required=True, help="(row_id, cluster_id) parquet")
    ap.add_argument("--docs", required=True, help="documents parquet (row_id + text)")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--id-column", default="row_id")
    ap.add_argument("--out", default="/tmp/tdr_report/report")
    ap.add_argument("--num-top", type=int, default=20)
    args = ap.parse_args(argv)

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        clusters = ray.data.read_parquet(args.clusters)
        docs = ray.data.read_parquet(args.docs)
        summary = write_report(
            clusters, docs, args.out, args.text_column, args.id_column, args.num_top
        )
        print(json.dumps({"out": args.out + ".html", **{
            k: v for k, v in summary.items() if not isinstance(v, dict) and not isinstance(v, list)
        }}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
