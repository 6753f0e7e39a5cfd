"""Directory-listing-as-catalog (SURVEY §2.1 S9).

The reference discovers its per-protein inputs by scanning directories for
filename patterns, warning on zero or multiple matches
(Sequence_Counter.py:243–271, 296–300; Sequence_Filter.py:35–44;
Time_Series.py:119–128). Distributed engines replace most of this with
partitioned-table discovery (`protein=` directories), but the explicit
glob + warning behavior is still the right tool for loose file drops."""

from __future__ import annotations

import glob as _glob
import os
import warnings


def discover_protein_files(
    directory: str, proteins: list[str], pattern: str = "{protein}_*"
) -> dict[str, str]:
    """One file per protein by glob; warns (like the reference) and skips
    on zero matches, warns and takes the lexicographically first on
    multiple matches."""
    out: dict[str, str] = {}
    for protein in proteins:
        hits = sorted(_glob.glob(os.path.join(directory, pattern.format(protein=protein))))
        if not hits:
            warnings.warn(f"no file found for protein {protein!r} in {directory}")
            continue
        if len(hits) > 1:
            warnings.warn(
                f"{len(hits)} files match protein {protein!r}; using {hits[0]}"
            )
        out[protein] = hits[0]
    return out


def discover_partitions(directory: str, column: str = "protein") -> dict[str, str]:
    """Partitioned-layout discovery: ``<dir>/<column>=<value>`` → value→path
    (the engine-native catalog the FASTA sink writes)."""
    out: dict[str, str] = {}
    for p in sorted(_glob.glob(os.path.join(directory, f"{column}=*"))):
        if os.path.isdir(p):
            out[os.path.basename(p).split("=", 1)[1]] = p
    return out
