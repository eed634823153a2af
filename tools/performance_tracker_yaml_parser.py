#!/usr/bin/env python3
"""Parse performance-tracker YAML output into tabular form.

Equivalent of the reference's utility_scripts/performance_tracker_yaml_parser.py
(which loads the YAML documents into pandas for plotting).  Works without
PyYAML by parsing the two-level ``category: {name: value}`` schema the
tracker emits.

Usage: python tools/performance_tracker_yaml_parser.py --tracking_file f.yaml
"""

from __future__ import annotations

import argparse
import sys
from typing import Any, Dict, List


def _parse_scalar(text: str) -> Any:
    t = text.strip()
    if t.startswith('"') and t.endswith('"'):
        return t[1:-1]
    if t.startswith("[") and t.endswith("]"):
        # flow-style lists (e.g. cg.iterations_per_machine: [3, 4, 5]);
        # split on commas OUTSIDE quotes — the writer quotes strings that
        # contain commas/colons
        inner = t[1:-1].strip()
        if not inner:
            return []
        toks, buf, quoted = [], [], False
        for ch in inner:
            if ch == '"':
                quoted = not quoted
                buf.append(ch)
            elif ch == "," and not quoted:
                toks.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        toks.append("".join(buf))
        return [_parse_scalar(tok) for tok in toks]
    for cast in (int, float):
        try:
            return cast(t)
        except ValueError:
            continue
    if t in ("true", "false"):
        return t == "true"
    return t


def parse_tracking_file(filename: str) -> List[Dict[str, Any]]:
    """Each ``---`` document becomes one flat dict: 'category.name' -> value."""
    docs: List[Dict[str, Any]] = []
    current: Dict[str, Any] = {}
    category = None
    with open(filename, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if line.strip() == "---":
                if current:
                    docs.append(current)
                current = {}
                category = None
                continue
            if not line.strip():
                continue
            if not line.startswith(" "):
                key, _, value = line.partition(":")
                if value.strip() == "":
                    category = key.strip()
                else:
                    current[key.strip()] = _parse_scalar(value)
                    category = None
            else:
                key, _, value = line.strip().partition(":")
                prefix = f"{category}." if category else ""
                current[f"{prefix}{key.strip()}"] = _parse_scalar(value)
    if current:
        docs.append(current)
    return docs


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tracking_file", required=True,
                        help="the YAML file storing the tracked performance")
    parser.add_argument("--csv", action="store_true",
                        help="emit CSV instead of a pretty table")
    args = parser.parse_args()

    docs = parse_tracking_file(args.tracking_file)
    if not docs:
        print("no tracking documents found", file=sys.stderr)
        return 1

    keys: List[str] = []
    for doc in docs:
        for key in doc:
            if key not in keys:
                keys.append(key)

    if args.csv:
        # RFC-4180 quoting via the csv module: list-valued entries (e.g.
        # cg.iterations_per_machine: [3, 4, 5]) contain commas and would
        # otherwise shift every following column
        import csv as _csv
        import sys as _sys

        writer = _csv.writer(_sys.stdout, lineterminator="\n")
        writer.writerow(keys)
        for doc in docs:
            writer.writerow([str(doc.get(k, "")) for k in keys])
    else:
        try:
            import pandas as pd

            frame = pd.DataFrame(docs, columns=keys)
            print(frame.to_string())
        except ImportError:
            for i, doc in enumerate(docs):
                print(f"--- document {i}")
                for key in keys:
                    if key in doc:
                        print(f"  {key}: {doc[key]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
