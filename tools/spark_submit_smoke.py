"""spark-submit --py-files smoke: the north-rule deployment path, end to end.

Packages `pysearchlite_spark/` into a zip, then runs the two job entrypoints
exactly as a cluster user would:

  spark-submit --py-files psl.zip jobs/build_index.py --input ... --index-dir ...
  spark-submit --py-files psl.zip jobs/query.py --index-dir ... --queries file

and verifies the query protocol output against DuckDB ground truth over the
same parquet. local[4] stands in for the cluster master; --py-files proves
the package ships as a zip dependency (no repo-relative imports at runtime).

Usage: python tools/spark_submit_smoke.py [sf_dir]  → one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def make_zip(dest: str) -> str:
    zpath = os.path.join(dest, "pysearchlite_spark.zip")
    pkg = os.path.join(REPO, "pysearchlite_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def submit(zpath: str, job: str, *args: str) -> str:
    # entrypoints are COPIED out of the repo first: jobs/*.py prepend their
    # repo root to sys.path for in-repo use, which would silently satisfy
    # the package import without the zip — from /tmp the zip is the only
    # source, which is what this smoke must prove
    staged = os.path.join(os.path.dirname(zpath), job)
    if not os.path.exists(staged):
        shutil.copy(os.path.join(REPO, "jobs", job), staged)
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.ui.enabled=false",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--py-files", zpath, staged, *args]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                         cwd=tempfile.gettempdir(), timeout=600)
    if out.returncode != 0:
        raise RuntimeError(f"{job} failed:\n{out.stderr[-4000:]}")
    return out.stdout


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="submit_smoke_")
    try:
        zpath = make_zip(work)
        idx_dir = os.path.join(work, "idx")
        submit(zpath, "build_index.py", "--input",
               f"{sf}/documents.parquet", "--index-dir", idx_dir,
               "--id-col", "doc_id", "--segment-docs", "200")

        qfile = os.path.join(work, "queries.txt")
        with open(qfile, "w") as f:
            f.write("COUNT\ttable part\n"
                    "TOP_10_COUNT\tquery value\n"
                    "COUNT\tzzmissing\n"
                    "TOP_10\tquery value\n")
        stdout = submit(zpath, "query.py", "--index-dir", idx_dir,
                        "--queries", qfile)
        lines = [l for l in stdout.splitlines() if l.strip()]

        import duckdb
        tok = ("list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
               "t -> t <> '')")

        def count(q: str) -> int:
            pred = " AND ".join(f"list_contains({tok}, '{t}')"
                                for t in q.split())
            return duckdb.sql(
                f"SELECT count(*) FROM read_parquet("
                f"'{sf}/documents.parquet') WHERE {pred}").fetchone()[0]

        want = [str(count("table part")), str(count("query value")), "0"]
        ok = lines[:3] == want and ":" in lines[3] and len(
            lines[3].split()) == 10

        # the training-sequence export job over the same corpus: packed
        # token total must equal DuckDB's independent token count
        seq_dir = os.path.join(work, "seqs")
        rep = json.loads(submit(
            zpath, "export_sequences.py", "--input",
            f"{sf}/documents.parquet", "--out-dir", seq_dir,
            "--seq-len", "256", "--mode", "pack"
        ).strip().splitlines()[-1])
        want_toks = duckdb.sql(
            f"SELECT sum(len({tok})) FROM read_parquet("
            f"'{sf}/documents.parquet')").fetchone()[0]
        export_ok = (rep["n_tokens"] == int(want_toks)
                     and rep["n_seqs"] == -(-int(want_toks) // 256))
        ok = ok and export_ok

        print(json.dumps({"spark_submit_smoke": "pass" if ok else "FAIL",
                          "got": lines, "want_counts": want,
                          "export": rep, "export_ok": export_ok,
                          "zip": os.path.basename(zpath)}))
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
