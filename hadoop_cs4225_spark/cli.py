"""Drop-in CLI for the reference's two jobs (O13 orchestration parity).

Reference invocations (from ``.vscode/launch.json:8-34`` — the de-facto
harness):

    WordCount <in...> <out>
    TopkCommonWords <in1> <in2> <stopwords> <out>

Equivalent here::

    python -m hadoop_cs4225_spark.cli wordcount <in...> <out>
    python -m hadoop_cs4225_spark.cli topk <in1> <in2> <stopwords> <out> \
        [--mode max|min] [-k 20]

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

    args = parser.parse_args(argv)
    spark = get_spark(app_name=f"cs4225-{args.job}")
    try:
        if args.job == "wordcount":
            if len(args.paths) < 2:
                parser.error("wordcount needs at least one input and an output dir")
            *inputs, out = args.paths
            df = word_count_text(spark, inputs)
            write_text_kv(df, out, "word", "cnt")
        else:
            df = topk_common_words_text(
                spark, args.in1, args.in2, args.stopwords,
                mode=args.mode, k=args.k,
            )
            write_text_kv(df, args.out, "score", "word")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
