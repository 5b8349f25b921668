"""spark-submit entry point: run the full feature-extraction pipeline
with stage checkpoints and print metrics.

Usage (ship path, north rule):
    zip -r pkg.zip cookieblock_consent_classifier_spark
    spark-submit --py-files pkg.zip -m cookieblock_consent_classifier_spark.cli \
        --input <parquet dir or synth:N> --output <dir> [--format libsvm|parquet]

Replaces the reference's prepare_training_data.py CLI
(prepare_training_data.py:60-139): scan → filter → extract → sink →
feature map, plus checkpoint/resume and per-stage metrics.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import functions as F

from cookieblock_consent_classifier_spark import sinks
from cookieblock_consent_classifier_spark.plans.compiler import compile_features, default_schema
from cookieblock_consent_classifier_spark.runtime.checkpoints import CheckpointedPipeline
from cookieblock_consent_classifier_spark.session import get_spark
from cookieblock_consent_classifier_spark.sources.resources import fixture_resources
from cookieblock_consent_classifier_spark.sources.synth import synth_cookie_updates


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path or synth:<num_entities>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet", choices=["parquet", "libsvm"])
    ap.add_argument(
        "--mode", default="extract", choices=["extract", "predict", "train"],
        help="extract = training extraction (prepare_training_data.py "
        "analogue); predict = inference dataflow (predict_class.py "
        "analogue: no label filter, score, Bayesian decision, "
        "predictions JSON + consent histogram); train = extract + "
        "Spark-native GBDT (operators/gbdt.py, no GBDT library) -> "
        "reference-format model_dump.json servable by --mode predict "
        "--model-dump",
    )
    ap.add_argument("--train-rounds", type=int, default=3)
    ap.add_argument("--train-depth", type=int, default=3)
    ap.add_argument(
        "--holdout", type=float, default=0.2,
        help="train mode: deterministic md5-hash holdout fraction for "
        "validation accuracy (train_test_split analogue, "
        "train_xgb.py:292 — hash-based so resumable runs split "
        "identically); 0 disables",
    )
    ap.add_argument(
        "--cmp-prefix", default="OptanonConsent",
        help="predict mode: cookie-name prefix for the consent histogram "
        "(predict_class.py:152-161)",
    )
    ap.add_argument(
        "--model-dump", default=None,
        help="predict mode: path to an XGBoost JSON tree dump; scores "
        "with the dump-compiled native predictor (xgbpredictor_dump.py "
        "analogue, equal-loss decision == predict_class.py:135) instead "
        "of the deterministic stub scorer",
    )
    ap.add_argument(
        "--dump-format", default="full", choices=["full", "sparse"],
        help="--model-dump layout: full = one xgboost JSON dump "
        "(flat tree list, round-robin classes); sparse = JSON list of "
        "per-class minimal-format forests (xgbpredictor_sparsedump.py)",
    )
    ap.add_argument("--num-updates", type=int, default=None,
                    help="override num_updates (default: config value, else 1)")
    ap.add_argument("--num-diffs", type=int, default=None,
                    help="override num_diffs (default: config value, else 1)")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument(
        "--features-json", default=None,
        help="features.json-format config (reference schema shape); "
        "widths/args/enabled flags and resource files come from it",
    )
    ap.add_argument(
        "--resources-dir", default=None,
        help="base dir for relative resource paths in --features-json",
    )
    args = ap.parse_args(argv)

    spark = get_spark(app_name="cbcs-extract")
    if args.features_json:
        from cookieblock_consent_classifier_spark.sources.config import load_features_config

        schema, res = load_features_config(args.features_json, base_dir=args.resources_dir)
    else:
        res = fixture_resources()
        schema = default_schema(res)
    if args.num_updates is not None or args.num_diffs is not None:
        import dataclasses

        schema = dataclasses.replace(
            schema,
            num_updates=args.num_updates or schema.num_updates,
            num_diffs=args.num_diffs or schema.num_diffs,
        )

    ckpt_root = os.path.join(args.output, "_checkpoints")
    if args.no_resume and os.path.exists(ckpt_root):
        import shutil

        shutil.rmtree(ckpt_root)
    pipe = CheckpointedPipeline(
        spark, ckpt_root,
        config_token=f"u{schema.num_updates}d{schema.num_diffs}"
                     f"w{schema.total_width}i{args.input}",
    )

    def load(_):
        if args.input.startswith("synth:"):
            return synth_cookie_updates(spark, int(args.input.split(":", 1)[1]))
        return spark.read.parquet(args.input)

    src = pipe.stage("scan", load)

    names_holder: list[list[str]] = []
    # train needs the labeled/filtered extraction path too; only
    # predict runs the no-filter inference extraction
    training = args.mode in ("extract", "train")

    def extract(df):
        wide, names = compile_features(
            df, schema, res, training=training, with_weights=training
        )
        names_holder.append(names)
        return wide

    feat = pipe.stage("extract", extract, upstream=src.df, upstream_fingerprint="scan")
    names = names_holder[0] if names_holder else schema.feature_names()

    if args.mode == "train":
        # train -> dump -> (servable by --mode predict --model-dump):
        # the engine's own GBDT over the extracted sparse rows, dumped
        # in the reference full-dump format (xgbpredictor_dump.py)
        from cookieblock_consent_classifier_spark import predict as P, xgb
        from cookieblock_consent_classifier_spark.operators import gbdt

        if not 0.0 <= args.holdout < 1.0:
            raise SystemExit(f"--holdout must be in [0, 1), got {args.holdout}")
        # deterministic hash split (the SAME helper the search/CV
        # dataflow uses — 60-bit md5, uniform buckets): stable across
        # resumed runs
        from cookieblock_consent_classifier_spark.operators.search import hash_fold

        train_df, holdout_df = feat.df, None
        if args.holdout > 0:
            bucket = hash_fold(F.col("entity_id").cast("string"), 1000)
            cut = round(args.holdout * 1000)
            train_df = feat.df.filter(bucket >= cut)
            holdout_df = feat.df.filter(bucket < cut)
            # re-derive inverse-class-frequency weights from the TRAIN
            # split only (the extract-stage weights were computed over
            # the full corpus and would fold holdout label counts into
            # the objective)
            # total folded into the counts aggregate (opt r7, same as
            # plans/assemble.py): counts.agg(sum) re-ran the ENTIRE
            # feature-pipeline lineage a second time just to total
            # the per-label longs
            counts = train_df.groupBy("label").agg(F.count("*").alias("__n"))
            packed = counts.agg(
                F.collect_list(F.struct("label", "__n")).alias("__cs")
            )
            w = packed.select(
                F.explode("__cs").alias("__c"),
                F.aggregate(
                    "__cs", F.lit(0).cast("bigint"), lambda a, x: a + x["__n"]
                ).alias("__t"),
            ).select(
                F.col("__c.label").alias("label"),
                (F.col("__t") / F.col("__c.__n")).alias("__w"),
            )
            train_df = (
                train_df.drop("weight")
                .join(F.broadcast(w), "label", "left")
                .withColumnRenamed("__w", "weight")
            )

        dump = gbdt.train_gbdt(
            train_df,
            gbdt.GBDTParams(
                num_rounds=args.train_rounds, max_depth=args.train_depth
            ),
        )
        xgb.validate_full_dump(dump, 4)
        os.makedirs(args.output, exist_ok=True)
        dump_path = os.path.join(args.output, "model_dump.json")
        with open(dump_path, "w", encoding="utf-8") as fd:
            json.dump(dump, fd)
        # also export the reference's minimal sparse format (its
        # JS-deployment artifact; servable via --dump-format sparse)
        sparse_path = os.path.join(args.output, "model_sparse.json")
        with open(sparse_path, "w", encoding="utf-8") as fd:
            json.dump(xgb.to_sparse_format(dump), fd)
        score_fn = xgb.dump_score_fn(dump)  # compile the scorer once

        def _acc(df):
            if df is None:
                return None
            r = P.predict(df, score_fn=score_fn, loss=P.EQUAL_LOSS).select(
                F.avg((F.col("predicted_label") == F.col("label")).cast("double")).alias("a")
            ).first()["a"]
            return round(r, 4) if r is not None else None  # empty split

        print(json.dumps({
            "stages": pipe.metrics(),
            "width": len(names),
            "model_dump": dump_path,
            "model_sparse": sparse_path,
            "trees": len(dump),
            "train_accuracy": _acc(train_df),
            "holdout_accuracy": _acc(holdout_df),
        }))
        return

    if args.mode == "predict":
        # inference dataflow (predict_class.py:107-161): score ->
        # Bayesian loss-matrix decision -> predictions JSON + the
        # consent-cookie histogram for the CMP name prefix
        from cookieblock_consent_classifier_spark import predict as P

        # the sparse feature row drops entity attrs; re-attach the
        # cookie name from the scan stage for the histogram filter
        names_df = src.df.select("entity_id", "name").dropDuplicates(["entity_id"])

        score_fn = None
        loss = None
        if args.model_dump:
            from cookieblock_consent_classifier_spark import xgb  # noqa: PLC0415

            with open(args.model_dump) as fd:
                dump = json.load(fd)
            score_fn = xgb.dump_score_fn(dump, fmt=args.dump_format)
            loss = P.EQUAL_LOSS  # predict_class.py:135

        def predict_stage(df):
            return (
                P.predict(df, score_fn=score_fn, loss=loss)
                .join(names_df, "entity_id", "left")
                .select("entity_id", "name", "probs", "predicted_label")
            )

        pred = pipe.stage(
            "predict", predict_stage, upstream=feat.df, upstream_fingerprint="extract",
        )
        P.write_predictions_json(pred.df, os.path.join(args.output, "predictions_json"))
        hist = P.consent_histogram(
            pred.df.select("entity_id", "predicted_label"),
            pred.df.select("entity_id", "name"),
            args.cmp_prefix,
        ).collect()
        print(json.dumps({
            "stages": pipe.metrics(),
            "width": len(names),
            "consent_histogram": {str(r["predicted_label"]): r["n"] for r in hist},
        }))
        return

    if args.format == "libsvm":
        sinks.write_libsvm(feat.df, os.path.join(args.output, "features_libsvm"))
    else:
        sinks.write_parquet(feat.df, os.path.join(args.output, "features_parquet"))
    sinks.write_feature_map(names, os.path.join(args.output, "feature_map.txt"))

    print(json.dumps({"stages": pipe.metrics(), "width": len(names)}))


if __name__ == "__main__":
    main()
