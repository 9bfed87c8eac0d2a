"""CLI: run the full CDC pipeline the way the reference's operator would.

    python -m airbnb_cdc_spark run \
        --raw-dir /data/customer-raw --archive-dir /data/customer-archive \
        --feed-dir /data/booking-feed --checkpoint-dir /data/ckpt \
        --warehouse-dir /data/warehouse

Afterwards prints the reference's three verification row counts
(README.md:269-273 of the reference: dim_customer / fact_booking /
BookingCustomerAggregation).
"""

from __future__ import annotations

import argparse

from airbnb_cdc_spark.plans.pipelines import run_all
from airbnb_cdc_spark.session import get_spark


def main() -> None:
    p = argparse.ArgumentParser(prog="airbnb_cdc_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run the full pipeline (E1)")
    runp.add_argument("--raw-dir", required=True)
    runp.add_argument("--archive-dir", required=True)
    runp.add_argument("--feed-dir", required=True)
    runp.add_argument("--checkpoint-dir", required=True)
    runp.add_argument("--warehouse-dir", required=True)
    args = p.parse_args()

    spark = get_spark("airbnb_cdc_spark")
    tables = run_all(
        spark,
        raw_dir=args.raw_dir,
        archive_dir=args.archive_dir,
        feed_dir=args.feed_dir,
        checkpoint_dir=args.checkpoint_dir,
        warehouse_dir=args.warehouse_dir,
    )
    for name, table in tables.items():
        print(f"{name}: {table.read().count()} rows")


if __name__ == "__main__":
    main()
