"""Clean-corpus materialization runner — the cleaning pipeline's terminal
step as a command:

    python -m hadith_vector_search_spark.clean \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/clean_corpus [--json]

Composes the auditable decision tables (`cleaning_decisions`,
`dedup_removal_list`) into the lang-partitioned training corpus via
`plans.pipeline.materialize_clean_corpus` and prints the stats roll-up.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        description="Materialize the cleaned training corpus")
    parser.add_argument("--sf-dir", required=True,
                        help="input corpus dir (documents.parquet)")
    parser.add_argument("--out", required=True,
                        help="output dir for the lang-partitioned corpus")
    parser.add_argument("--json", action="store_true", dest="as_json")
    args = parser.parse_args(argv)

    from .plans.pipeline import materialize_clean_corpus
    from .session import get_spark

    spark = get_spark("clean-cli")
    spark.sparkContext.setLogLevel("ERROR")
    stats = materialize_clean_corpus(spark, args.sf_dir, args.out)
    if args.as_json:
        print(json.dumps(stats))
    else:
        for k, v in stats.items():
            print(f"{k}={v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
