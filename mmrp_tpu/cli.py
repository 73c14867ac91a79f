"""Command-line entry points.

The reference's entry scripts (reference: src/data_run.py,
src/Trainner/train.py, src/Evaluate/*.py, src/web/app.py) hardcode paths
and read one YAML (SURVEY §5.6). Here a single ``python -m mmrp_tpu.cli``
exposes them as subcommands with explicit flags:

    data        parse + label + verify + split (data_run.py:31-62)
    train       staged training: swin finetune -> KG -> joint (train.py:209)
    eval-cls    classification eval on a split (eval_on_test.py)
    eval-ret    dual-gallery retrieval eval (retrieval_eval.py)
    kg-probe    KG embedding health checks (kg_check/diagnose/probe)
    serve       web demo (web/app.py)
    calibrate   int8_static activation calibration (models/quant_calib.py)
    export-serving  package a run into a serialized serving artifact
    bench       run the benchmark
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--out", default="runs/default", help="output directory")


def cmd_data(args) -> int:
    from mmrp_tpu.data.openi import parse_openi_xml
    from mmrp_tpu.data.splits import train_val_test_split
    from mmrp_tpu.data.verify import LabelVerifier, apply_verdicts
    from mmrp_tpu.eval.eda import drop_zero_label_records, eda_before_split
    from mmrp_tpu.labels import LABEL_COLS

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    records = parse_openi_xml(
        args.xml_dir, args.dicom_dir, cache_path=str(out / "records_cache.json")
    )
    print(f"[data] parsed {len(records)} records")
    # the live rotating-key Gemini client activates when GEMINI_KEYS is
    # set (data/verify.py::gemini_client_from_env); otherwise complete is
    # None and verification is the offline cached/Unknown pass-through
    from mmrp_tpu.data.verify import gemini_client_from_env

    verifier = LabelVerifier(cache_path=str(out / "verify_cache.json"),
                             complete=gemini_client_from_env())
    records = apply_verdicts(records, verifier.verify(records))
    eda_before_split(records, LABEL_COLS, str(out / "eda_before_split.json"))
    records = drop_zero_label_records(records)
    splits = train_val_test_split(records, seed=args.seed, out_dir=str(out / "splits"))
    print(f"[data] splits: { {k: len(v) for k, v in splits.items()} }")

    # per-split distribution check + phrase-match spot check (data_run.py stages)
    from mmrp_tpu.data.labeler import PhraseLabeler
    from mmrp_tpu.eval.eda import eda_after_split, phrase_match_check

    by_id = {r["id"]: r for r in records}
    eda_after_split(splits, by_id, LABEL_COLS, str(out / "eda_after_split.json"))
    checks = phrase_match_check(records, PhraseLabeler(), n_samples=10)
    (out / "phrase_check.json").write_text(json.dumps(checks, indent=1))

    # visual diagnostics (dataEDAnLabeledCheck.py, data_phrase_check.py:61-110)
    import numpy as np

    from mmrp_tpu.eval.eda import (
        dicom_debug_plots, label_distribution_plot, mesh_label_stats,
    )

    eda_dir = out / "eda"
    mesh_label_stats(args.xml_dir, out_dir=str(eda_dir))
    if records:
        dicom_debug_plots(records[0]["dicom_path"], str(eda_dir))
        label_distribution_plot(
            np.stack([r["labels"] for r in records]), LABEL_COLS,
            str(eda_dir / "label_distribution.png"),
        )
    return 0


def cmd_train(args) -> int:
    from mmrp_tpu.config import Config
    from mmrp_tpu.train.runner import run_training_pipeline

    cfg = Config.load(args.config) if args.config else Config()
    if args.resume:
        cfg = cfg.replace(resume=True)
    run_training_pipeline(cfg, data_dir=args.data, out_dir=args.out)
    return 0


def cmd_eval_cls(args) -> int:
    import numpy as np

    from mmrp_tpu.eval.classification import evaluate_classification
    from mmrp_tpu.labels import LABEL_COLS

    probs = np.load(args.probs)
    labels = np.load(args.labels)
    th = np.load(args.thresholds) if args.thresholds else None
    rep = evaluate_classification(probs, labels, LABEL_COLS, th, args.out)
    print(json.dumps({k: v for k, v in rep.items() if k != "per_class"}, indent=1))
    return 0


def cmd_eval_ret(args) -> int:
    import numpy as np

    from mmrp_tpu.eval.gt import build_label_overlap_gt
    from mmrp_tpu.eval.retrieval_eval import dual_gallery_eval
    from mmrp_tpu.retrieval.gallery import RetrievalEngine

    test_eng = RetrievalEngine.from_files(args.test_emb, args.test_ids)
    train_eng = RetrievalEngine.from_files(args.train_emb, args.train_ids)
    q_embs = test_eng.raw_embeddings
    q_ids = test_eng.ids
    gt_test = json.loads(Path(args.gt_test).read_text())
    gt_train = json.loads(Path(args.gt_train).read_text())
    res = dual_gallery_eval(
        test_eng, train_eng, q_embs, q_ids, gt_test, gt_train,
        k=args.k, out_dir=args.out,
    )
    if args.variants:
        # reranker ablations + paired significance vs baseline (reference
        # retrieval_eval_variants.py:31-153; significance is advertised in
        # the reference README.md:82 but implemented only here)
        from mmrp_tpu.eval.retrieval_eval import variant_eval
        from mmrp_tpu.labels import LABEL_COLS
        from mmrp_tpu.retrieval.rerank import Reranker
        from mmrp_tpu.serve.runner import load_rerank_inputs

        labels_by_id, kg_kwargs = {}, {}
        if args.run_dir:
            labels_by_id, _, kg_kwargs = load_rerank_inputs(
                args.run_dir, data_dir=args.data
            )

        def factory(a, b, c):
            return Reranker(alpha=a, beta=b, gamma=c,
                            labels_by_id=labels_by_id,
                            label_names=LABEL_COLS, **kg_kwargs)

        res["variants"] = variant_eval(
            test_eng, q_embs, q_ids, gt_test, factory, k=args.k,
            out_path=str(Path(args.out) / "variants.json"),
        )
    print(json.dumps(res, indent=1))
    return 0


def cmd_parity(args) -> int:
    from mmrp_tpu.eval.parity import run_parity

    rep = run_parity(args.data, args.run_dir, out_dir=args.out, k=args.k,
                     explain_queries=args.explain_n)
    out = args.out or str(Path(args.run_dir) / "parity")
    print(json.dumps(
        {"report": str(Path(out) / "PARITY_RESULTS.md"),
         "n_test": rep["n_test"], "wall_s": rep["wall_s"]}, indent=1))
    return 0


def cmd_kg_probe(args) -> int:
    from mmrp_tpu.eval.kg_probe import full_probe
    from mmrp_tpu.labels import LABEL_COLS

    rep = full_probe(args.kg_dir, LABEL_COLS, out_path=args.out_file)
    print(json.dumps(rep["health"], indent=1))
    return 0


def cmd_mapper(args) -> int:
    from mmrp_tpu.kg.ontology import run_mapper

    written = run_mapper(args.out)
    print(json.dumps(written, indent=1))
    return 0


def cmd_serve(args) -> int:
    from mmrp_tpu.serve.runner import build_demo_context
    from mmrp_tpu.serve.app import serve

    serve(lambda: build_demo_context(args.run_dir, data_dir=args.data),
          port=args.port)
    return 0


def cmd_stream(args) -> int:
    from mmrp_tpu.serve.stream import run_stream

    stats = run_stream(args.run_dir, args.data, split=args.split,
                       out_dir=args.out_dir, K=args.k,
                       batch_size=args.batch_size)
    print(json.dumps(stats, indent=1))
    return 0


def cmd_calibrate(args) -> int:
    """Post-training activation calibration for serve_quant="int8_static":
    run the trained Swin tower over real preprocessed DICOMs from the
    run's records cache and write the per-block abs-max artifact that
    build_demo_context auto-picks up (serve/runner.py). No reference
    counterpart — the reference serves unquantized torch AMP
    (src/Trainner/train.py); this enables the TPU int8 MXU rate."""
    import numpy as np

    from mmrp_tpu.models.quant_calib import (
        calibrate_swin_act_amax,
        save_act_amax,
        swin_params_of,
    )
    from mmrp_tpu.serve.runner import build_demo_context

    ctx = build_demo_context(args.run_dir, data_dir=args.data)
    predictor, pp = ctx["predictor"], ctx["preprocessor"]
    swin_cfg = predictor.model.config.swin
    sp = swin_params_of(predictor.params)
    if sp is None:
        print("run's model has no Swin tower — nothing to calibrate",
              file=sys.stderr)
        return 2
    recs = [r for r in ctx["records_by_id"].values() if r.get("dicom_path")]
    recs = recs[: args.n]
    if not recs:
        print("no records with dicom_path in records_cache.json — run "
              "`cli data` first (or pass --data)", file=sys.stderr)
        return 2
    images = np.stack([
        np.transpose(pp.load(r["dicom_path"]), (1, 2, 0)) for r in recs
    ]).astype(np.float32)
    amax = calibrate_swin_act_amax(swin_cfg, sp, images,
                                   batch_size=args.batch_size)
    out = args.out or str(Path(args.run_dir) / "swin_act_amax.json")
    save_act_amax(out, amax)
    print(json.dumps({"artifact": out, "blocks": len(amax),
                      "images": len(recs)}))
    return 0


def cmd_export_serving(args) -> int:
    from mmrp_tpu.serve.exported import export_run

    meta = export_run(
        args.run_dir, args.out_path,
        batch_sizes=tuple(int(b) for b in args.batches.split(",")),
        platforms=tuple(args.platforms.split(",")),
        data_dir=args.data,
    )
    print(json.dumps({"artifact": args.out_path, **meta}, indent=1))
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="mmrp_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("data", help="run the data pipeline")
    p.add_argument("--xml-dir", required=True)
    p.add_argument("--dicom-dir", required=True)
    p.add_argument("--seed", type=int, default=2709)
    _add_common(p)
    p.set_defaults(fn=cmd_data)

    p = sub.add_parser("train", help="staged training pipeline")
    p.add_argument("--data", required=True, help="data pipeline output dir")
    p.add_argument("--resume", action="store_true",
                   help="resume the joint stage from its last full-state ckpt")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval-cls", help="classification eval")
    p.add_argument("--probs", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--thresholds", default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_eval_cls)

    p = sub.add_parser("eval-ret", help="retrieval eval (dual gallery)")
    p.add_argument("--test-emb", required=True)
    p.add_argument("--test-ids", required=True)
    p.add_argument("--train-emb", required=True)
    p.add_argument("--train-ids", required=True)
    p.add_argument("--gt-test", required=True)
    p.add_argument("--gt-train", required=True)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--data", default=None,
                   help="data pipeline output dir (records_cache.json) for "
                        "the reranker's label-overlap term; defaults to the "
                        "run dir's parent")
    p.add_argument("--variants", action="store_true",
                   help="also run reranker ablations + paired significance")
    p.add_argument("--run-dir", default=None,
                   help="trained run dir supplying reranker inputs (labels/KG)")
    _add_common(p)
    p.set_defaults(fn=cmd_eval_ret)

    p = sub.add_parser(
        "parity",
        help="run the reference's FULL eval protocol (classification + "
             "dual-gallery retrieval + variants/significance + explain "
             "alignment + diversity + KG probes) and write "
             "PARITY_RESULTS.md",
    )
    p.add_argument("--data", required=True,
                   help="data pipeline output dir (records_cache.json)")
    p.add_argument("--run-dir", required=True, help="trained run dir")
    p.add_argument("--out", default=None,
                   help="report dir (default: <run-dir>/parity)")
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--explain-n", type=int, default=8,
                   help="queries for the explain-alignment/diversity pass")
    p.set_defaults(fn=cmd_parity)

    p = sub.add_parser("kg-probe", help="KG embedding health checks")
    p.add_argument("--kg-dir", required=True)
    p.add_argument("--out-file", default=None)
    p.set_defaults(fn=cmd_kg_probe)

    p = sub.add_parser("mapper", help="label -> ontology mapping runner")
    p.add_argument("--out", default="runs/ontology")
    p.set_defaults(fn=cmd_mapper)

    p = sub.add_parser("serve", help="web demo")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--data", default=None,
                   help="data pipeline output dir (records_cache.json); "
                        "defaults to the run dir's parent")
    p.add_argument("--port", type=int, default=8000)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "stream",
        help="streaming embed+retrieve+predict over a split (high batch)")
    p.add_argument("--run-dir", required=True)
    p.add_argument("--data", required=True, help="data pipeline output dir")
    p.add_argument("--split", default="test")
    p.add_argument("--out-dir", default=None)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=None)
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser(
        "calibrate",
        help="int8_static activation calibration over run DICOMs "
             "(writes swin_act_amax.json into the run dir)",
    )
    p.add_argument("--run-dir", required=True)
    p.add_argument("--data", default=None, help="data pipeline output dir")
    p.add_argument("-n", type=int, default=64, help="calibration images")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--out", default=None,
                   help="artifact path (default RUN/swin_act_amax.json)")
    p.set_defaults(fn=cmd_calibrate)

    p = sub.add_parser(
        "export-serving",
        help="package a trained run into a serialized serving artifact "
             "(jax.export; no model code needed at load time)",
    )
    p.add_argument("--run-dir", required=True)
    p.add_argument("--out-path", required=True, help="artifact .npz path")
    p.add_argument("--data", default=None, help="data pipeline output dir")
    p.add_argument("--batches", default="1,8,32", help="batch buckets")
    p.add_argument("--platforms", default="cpu",
                   help="comma list; tpu programs must be lowered with "
                        "Pallas enabled on a TPU-visible process")
    p.set_defaults(fn=cmd_export_serving)

    p = sub.add_parser("bench", help="benchmark")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
