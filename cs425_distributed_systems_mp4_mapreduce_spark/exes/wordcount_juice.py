#!/usr/bin/env python3
"""WordCount juice executable [spec: A2/A13] — Hadoop-streaming-style
reducer contract: stdin delivers ``key\\tvalue`` lines with equal keys
ADJACENT (the engine sorts each juice partition before piping); emits
one ``key\\tsum`` line per key on the key boundary.

Standalone on purpose — see wordcount_maple.py.
"""

import sys


def main() -> None:
    out = sys.stdout
    cur: str | None = None
    acc = 0
    for line in sys.stdin:
        k, _, v = line.rstrip("\n").partition("\t")
        if cur is not None and k != cur:
            out.write(f"{cur}\t{acc}\n")
            acc = 0
        cur = k
        acc += int(v)
    if cur is not None:
        out.write(f"{cur}\t{acc}\n")


if __name__ == "__main__":
    main()
