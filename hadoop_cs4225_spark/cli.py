"""Drop-in CLI for the reference's two jobs (O13 orchestration parity).

Reference invocations (from ``.vscode/launch.json:8-34`` — the de-facto
harness):

    WordCount <in...> <out>
    TopkCommonWords <in1> <in2> <stopwords> <out>

Equivalent here::

    python -m hadoop_cs4225_spark.cli wordcount <in...> <out>
    python -m hadoop_cs4225_spark.cli topk <in1> <in2> <stopwords> <out> \
        [--mode max|min] [-k 20]

Beyond the two reference jobs, every registered query runs by name::

    python -m hadoop_cs4225_spark.cli query <name> [--sf DIR] [--out DIR]
    python -m hadoop_cs4225_spark.cli query --list

Output is Hadoop TextOutputFormat-shaped (``word TAB count`` sorted by
word for wordcount; ``count TAB word`` in golden tie order for topk) and
the job fails if the output directory exists — same contract as the
reference (``WordCount.java:61``). ``--mode min`` reproduces
input/answer1.txt, ``--mode max`` (default, code-faithful) answer2.txt.
"""

from __future__ import annotations

import argparse
import sys

from hadoop_cs4225_spark.operators.wordcount import (
    topk_common_words_text,
    word_count_text,
)
from hadoop_cs4225_spark.session import get_spark
from hadoop_cs4225_spark.sources.sinks import write_text_kv


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="hadoop_cs4225_spark")
    sub = parser.add_subparsers(dest="job", required=True)

    wc = sub.add_parser("wordcount", help="WordCount <in...> <out>")
    wc.add_argument("paths", nargs="+", help="input text file(s) then output dir")

    tk = sub.add_parser("topk", help="TopkCommonWords <in1> <in2> <stopwords> <out>")
    tk.add_argument("in1")
    tk.add_argument("in2")
    tk.add_argument("stopwords")
    tk.add_argument("out")
    tk.add_argument("--mode", choices=("max", "min"), default="max")
    tk.add_argument("-k", type=int, default=20)

    q = sub.add_parser("query", help="run any registered query by name")
    q.add_argument("name", nargs="?", help="query name (see --list)")
    q.add_argument("--sf", default="/root/testdata/sf0.001", help="table dir")
    q.add_argument("--out", help="write result as parquet instead of printing")
    q.add_argument("--list", action="store_true", help="list registered queries")
    q.add_argument("-n", type=int, default=20, help="rows to show (print mode)")

    args = parser.parse_args(argv)

    if args.job == "query" and args.list:
        from hadoop_cs4225_spark import registry

        registry.load_all()
        for name in sorted(registry.QUERIES):
            marker = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}\t{marker}")
        return 0
    if args.job == "query" and not args.name:
        parser.error("query needs a name (or --list)")
    spark = get_spark(app_name=f"cs4225-{args.job}")
    try:
        if args.job == "wordcount":
            if len(args.paths) < 2:
                parser.error("wordcount needs at least one input and an output dir")
            *inputs, out = args.paths
            df = word_count_text(spark, inputs)
            write_text_kv(df, out, "word", "cnt")
        elif args.job == "topk":
            df = topk_common_words_text(
                spark, args.in1, args.in2, args.stopwords,
                mode=args.mode, k=args.k,
            )
            write_text_kv(df, args.out, "score", "word")
        else:
            from hadoop_cs4225_spark import registry

            registry.load_all()
            if args.name not in registry.QUERIES:
                parser.error(f"unknown query {args.name!r} (try --list)")
            df = registry.QUERIES[args.name](spark, args.sf)
            if args.out:
                df.write.mode("error").parquet(args.out)
            else:
                df.show(args.n, truncate=False)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
