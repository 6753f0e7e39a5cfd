"""External-tool orchestration (reference Clustal_All.sh, rename_to_ORF.sh).

The reference shells out to an aligner per cluster file — a bash loop of
``clustalo -i <cluster>.fasta -o <cluster>_aligned.fasta`` (Clustal_All.sh:25)
with a rename pass after (rename_to_ORF.sh). The engine-native shape is
partition-batched subprocess orchestration:

- ONE process per PARTITION, never per record: the partition's records
  stream to a temp FASTA on executor-local disk, the tool runs once, the
  output FASTA parses back to rows. Process-spawn cost amortizes over the
  partition; a per-record exec would be the classic 1000×-slowdown.
- Group-aligned partitioning: callers who need the tool to see a whole
  cluster together ``repartition(col)`` first — the same contract as the
  reference's per-cluster files, expressed as a shuffle key instead of a
  filesystem layout.
- Honest gating: the aligner binary is NOT in this container, so the
  orchestration is proven with a stand-in command (tests + driver query
  run ``python -c`` as the subprocess). A missing binary fails fast at
  task start with a clear message, not a mid-stream stack trace.

At cluster scale the temp files live on executor-local disk (never the
driver), the subprocess inherits the executor's cgroup, and the operator
adds zero shuffles beyond the caller's chosen repartition.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "id string, sequence string"


def _write_fasta(path: str, ids, seqs) -> None:
    with open(path, "w") as f:
        for i, s in zip(ids, seqs):
            f.write(f">{i}\n{s}\n")


def _read_fasta(path: str) -> tuple[list[str], list[str]]:
    ids: list[str] = []
    seqs: list[str] = []
    cur: list[str] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n").rstrip("\r")
            if line.startswith(">"):
                if ids:
                    seqs.append("".join(cur))
                ids.append(line[1:])
                cur = []
            elif line:
                cur.append(line)
    if ids:
        seqs.append("".join(cur))
    return ids, seqs


def run_external_tool(
    df: DataFrame,
    command: list[str],
    id_col: str = "id",
    seq_col: str = "sequence",
) -> DataFrame:
    """Run a FASTA-in/FASTA-out external tool once per partition.

    ``command`` is an argv list containing the literal placeholders
    ``{input}`` and ``{output}`` (e.g. ``["clustalo", "-i", "{input}",
    "-o", "{output}"]``); each task substitutes its partition-local temp
    paths. Output rows are ``(id, sequence)`` as emitted by the tool —
    record count and order are the tool's contract, not the operator's
    (an aligner may drop or reorder records).
    """
    if not command or "{input}" not in command or "{output}" not in command:
        raise ValueError(
            "command must be an argv list containing the '{input}' and "
            "'{output}' placeholders"
        )
    binary = command[0]

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids: list = []
        seqs: list = []
        for pdf in batches:
            ids.extend(pdf[id_col].astype(str).tolist())
            seqs.extend(pdf[seq_col].astype(str).tolist())
        if not ids:
            return
        if shutil.which(binary) is None and not os.path.exists(binary):
            raise RuntimeError(
                f"external tool '{binary}' not found on this executor — "
                "install it on every node (reference Clustal_All.sh "
                "presupposes clustalo on PATH) or pass a stand-in command"
            )
        with tempfile.TemporaryDirectory(prefix="spark_ext_") as d:
            in_path = os.path.join(d, "in.fasta")
            out_path = os.path.join(d, "out.fasta")
            _write_fasta(in_path, ids, seqs)
            argv = [
                a.replace("{input}", in_path).replace("{output}", out_path)
                for a in command
            ]
            proc = subprocess.run(argv, capture_output=True, text=True)
            if proc.returncode != 0:
                raise RuntimeError(
                    f"external tool failed (exit {proc.returncode}): "
                    f"{proc.stderr[-500:]}"
                )
            out_ids, out_seqs = _read_fasta(out_path)
        yield pd.DataFrame({"id": out_ids, "sequence": out_seqs})

    return df.select(id_col, seq_col).mapInPandas(run_partition, OUT_SCHEMA)


# Deterministic stand-in "aligner" for environments without clustalo: an
# identity pass-through that exercises the full temp-file → subprocess →
# parse path. Used by the driver query and tests; a real deployment
# swaps in the actual binary via `command`.
IDENTITY_TOOL_SCRIPT = (
    "import sys\n"
    "with open(sys.argv[1]) as f, open(sys.argv[2], 'w') as g:\n"
    "    g.write(f.read())\n"
)


def identity_tool_command() -> list[str]:
    import sys

    return [sys.executable, "-c", IDENTITY_TOOL_SCRIPT, "{input}", "{output}"]
