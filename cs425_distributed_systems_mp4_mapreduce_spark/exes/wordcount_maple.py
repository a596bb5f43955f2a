#!/usr/bin/env python3
"""WordCount maple executable [spec: A1/A13] — Hadoop-streaming-style
stdin/stdout contract: reads input lines, emits one ``word\\t1`` line
per token.  Tokenization is a plain split on ' ' with empty tokens
KEPT, matching DuckDB's STRING_SPLIT (the oracle) and the in-process
maple lambda in queries/maplejuice_q.py.

This file is deliberately a standalone program with no imports from
the engine: the point of the pipe layer is that the reference's
maple_exe is an ARBITRARY executable crossing a process boundary.
"""

import sys


def main() -> None:
    out = sys.stdout
    for line in sys.stdin:
        for w in line.rstrip("\n").split(" "):
            out.write(w)
            out.write("\t1\n")


if __name__ == "__main__":
    main()
