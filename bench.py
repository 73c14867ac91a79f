"""Benchmark: image-text pairs embedded/sec/chip + retrieval latency.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: joint-embedding throughput (pairs/sec/chip) of the FLAGSHIP
parity architecture — Swin-B (the reference backbone, fusion.py:92) +
ClinicalBERT-dims text encoder + 5-layer fusion, text length 64 (median
OpenI report length; the reference pads to 512 but true reports are short).
BENCH_SWIN=tiny selects the lighter stand-in (recorded under its own
metric name). Baseline: the driver-set north star of 5,000 pairs/sec/chip
(BASELINE.json).

Deadline discipline (round 5): round 4's driver bench timed out compiling
the newest serving mix and recorded NOTHING (BENCH_r04.json rc=124).
A watchdog thread guarantees parseable output with TWO deadlines:
SOFT (BENCH_DEADLINE_S, default 520 s) prints the best line so far — or
an honest zero — and keeps measuring; HARD (BENCH_HARD_DEADLINE_S,
default 1500 s) prints and exits 0. The first real measurement is also
printed the moment it lands, before the retrieval bench or any upgrade
compile, so an external kill at ANY point after ~10 min leaves a real
number in the tail; the LAST printed line is the result. (The single
520 s exit recorded a zero once in round 5 when one tunnel compile ran
past it — hence soft-print-and-continue.) When BENCH_QUANT is not
pinned by the caller, the TPU run measures arms cheapest-compile-first:
(1) `int8_all` on the plain XLA path (no Mosaic kernels — the fastest
possible compile of the flagship program, so a real number lands even
on a degraded-helper day), (2) the round-3-PROVEN Pallas `int8` mix,
(3) the `int8_swins` static-quant upgrade. Better lines overwrite
earlier ones as they land. Explicitly setting BENCH_QUANT restores
single-variant behavior for A/B tooling.

Serving precision mixes (measured, tools/ab_bench.py):
- `int8`   — bf16 fused Pallas Swin + W8A8 int8 GEMMs (ops/quant.py) for
  the FLOP-bound fusion stack and BERT FFN/attention (round-3 default).
- `int8_swins` — additionally STATIC-scale W8A8 inside the Swin
  whole-block/pair kernels (pre-quantized weights + calibrated
  per-tensor activation scales, models/quant_calib.py — back-to-back
  Swin-B encoder −4.1% where dynamic quant lost +9.5%). Fidelity-gated
  by tests/test_quant_model.py and tests/test_quant_static.py
  (embedding cosine > 0.995 at every Swin-B stage width).
- `none` — pure bf16.

Timing methodology: the remote-execution tunnel used for this TPU neither
honors block_until_ready nor re-executes deduplicated dispatches, so naive
loops over-report by orders of magnitude (observed 51x chip peak). All
timed loops here are **chained lax.scan programs** — iteration i+1's input
depends on iteration i's output — finished by a single scalar fetch, so the
measured wall time must contain `iters` sequential real executions.
Secondary metrics (exact top-10 retrieval over a 100k-item gallery, per
query, chained) land in BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import os
import threading
import time

import numpy as np

_DEADLINE = [None]  # absolute time.monotonic() deadline, set by main()
# Best-so-far result the watchdog may publish: {"line": dict|None,
# "details": dict}. Updated under _LOCK as measurements complete.
_BEST = {"line": None, "details": {}}
_LOCK = threading.Lock()


def setup_compile_cache() -> None:
    """Persistent XLA compile cache: repeat bench/A-B runs skip the
    multi-minute first compile through the tunnel. Shared by every tool
    under tools/ (call before building models). NOTE: measured
    ineffective across processes on the axon backend (server-side
    compile) — kept because it is free and correct elsewhere."""
    import jax

    cache = os.path.join(os.path.expanduser("~"), ".cache", "mmrp_jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (AttributeError, ValueError):
        pass


def _publish(line: dict | None = None, details: dict | None = None) -> None:
    """Record the best-so-far headline line / merged details for the
    watchdog (and the normal exit path) to print."""
    with _LOCK:
        if line is not None:
            _BEST["line"] = line
        if details is not None:
            _BEST["details"].update(details)


def _merge_side_files(details: dict) -> None:
    """Fold the separately-measured row files into details so even a
    watchdog exit leaves a complete BENCH_DETAILS.json (the round-5
    zero-line run clobbered the history because this merge only ran on
    the normal exit path)."""
    here = os.path.dirname(os.path.abspath(__file__))
    for side, key in (("BENCH_TRAIN.json", "train_step"),
                      ("BENCH_TRAIN_FLAGSHIP.json", "train_step_flagship"),
                      ("BENCH_FLAGSHIP.json", "flagship_embed"),
                      ("BENCH_EXPLAIN.json", "explain"),
                      ("BENCH_STREAM.json", "stream"),
                      ("BENCH_KG.json", "kg_train"),
                      ("BENCH_LOADER.json", "input_pipeline")):
        p = os.path.join(here, side)
        if os.path.exists(p) and key not in details:
            try:
                with open(p) as fh:
                    details[key] = json.load(fh)
            except (OSError, ValueError) as e:  # noqa: PERF203
                details[key] = {"error": repr(e)}


def _zero_line() -> dict:
    return {
        "metric": "pairs_embedded_per_sec_per_chip(no-measurement)",
        "value": 0.0,
        "unit": "pairs/s/chip",
        "vs_baseline": 0.0,
    }


def _emit_and_exit(code: int = 0) -> None:
    """Write BENCH_DETAILS.json, print the single headline line, and
    hard-exit. os._exit keeps rc=0 even when called from the watchdog
    thread while the main thread is stuck in a tunnel compile."""
    with _LOCK:
        line = _BEST["line"]
        details = dict(_BEST["details"])
    if line is None:
        line = _zero_line()
    try:
        _merge_side_files(details)
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_DETAILS.json"), "w") as fh:
            json.dump(details, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(line), flush=True)
    os._exit(code)


def _time_left() -> float:
    if _DEADLINE[0] is None:
        return float("inf")
    return _DEADLINE[0] - time.monotonic()


def _start_watchdog(soft_s: float, hard_s: float) -> None:
    """Daemon thread with TWO deadlines (round-5 hardening — the single
    520 s exit recorded a zero when one tunnel compile ran long):

    - SOFT (BENCH_DEADLINE_S): print the best line so far — or the honest
      zero line — and KEEP RUNNING. The driver parses the LAST JSON line
      of stdout, so if its own timeout kills us later the tail still
      holds a parseable line (round-4's rc=124 had nothing at all).
    - HARD (BENCH_HARD_DEADLINE_S): emit and exit 0, so a well-behaved
      run always ends with rc=0 before any plausible external cap.

    Runs even while the main thread is blocked inside a GIL-releasing
    XLA/tunnel compile.
    """
    _DEADLINE[0] = time.monotonic() + hard_s
    soft_at = time.monotonic() + soft_s
    fired = [False]

    def _watch():
        while True:
            now = time.monotonic()
            if not fired[0] and now >= soft_at:
                fired[0] = True
                _publish(details={"soft_deadline_fired": True,
                                  "soft_deadline_s": soft_s})
                with _LOCK:
                    line = _BEST["line"] or _zero_line()
                print(json.dumps(line), flush=True)
            left = _time_left()
            if left <= 0:
                _publish(details={"watchdog_fired": True,
                                  "hard_deadline_s": hard_s})
                _emit_and_exit(0)
            time.sleep(min(max(soft_at - now, 0.1) if not fired[0]
                           else left, 5.0))

    threading.Thread(target=_watch, daemon=True, name="bench-watchdog").start()


def _build_model(use_pallas: bool, text_len: int, swin_name: str = None,
                 quant: str = None):
    import jax.numpy as jnp

    from mmrp_tpu.models.multimodal import MultiModalConfig, MultiModalRetrievalModel
    from mmrp_tpu.models.swin import SwinConfig
    from mmrp_tpu.models.text_encoder import TextConfig

    swin_name = swin_name or os.environ.get("BENCH_SWIN", "tiny")
    # BENCH_QUANT selects the serving precision mix (module docstring).
    # Measured mix history (tools/ab_bench.py, back-to-back): fusion stack
    # all-int8 (15.8->13.5 ms, at the chip's int8 FLOP floor); BERT int8
    # INSIDE the fused attention kernel + int8 FFN (12.0 -> 9.96 ms vs
    # bf16 fused); Swin static-int8 whole-block kernels -4.1% (round 4).
    # "int8_all" = plain XLA W8A8 everywhere (no fused kernels).
    # Act-scale values do not affect speed, so the bench uses a constant
    # (BENCH_ACT_AMAX, default 8.0); real serving calibrates via
    # models/quant_calib.py.
    quant = quant or os.environ.get("BENCH_QUANT", "int8_swins")
    swin_kw = {}
    if quant == "int8_swins":
        depths = {"tiny": (2, 2, 6, 2), "small": (2, 2, 18, 2),
                  "base": (2, 2, 18, 2)}.get(swin_name, (2, 2, 6, 2))
        a = float(os.environ.get("BENCH_ACT_AMAX", "8.0"))
        swin_kw = {"quant": "int8_static",
                   "act_amax": tuple((a,) * 4 for _ in range(sum(depths)))}
    cfg = MultiModalConfig(
        swin=SwinConfig.from_name(f"swin_{swin_name}", use_pallas=use_pallas,
                                  **swin_kw),
        text=TextConfig.clinicalbert(
            quant={"int8": "int8_kernel", "int8_all": "int8",
                   "int8_swins": "int8_kernel"}.get(quant, "none")),
        joint_dim=1024,
        num_fusion_layers=5,
        num_heads=8,
        num_classes=43,
        max_text_len=text_len,
        quant="int8" if quant.startswith("int8") else "none",
    )
    return MultiModalRetrievalModel(cfg, dtype=jnp.bfloat16), cfg


def _floor_pairs_per_sec(swin_name: str, text_len: int, quant: str) -> float:
    """Measured mixed-precision FLOP floor (pairs/s) for this chip slice.

    Rates are MEASURED on this tunneled slice (docs/ROOFLINE.md §1/§6),
    not nominal v5e: bf16 ~105 TF/s; int8 ~151 TOP/s on the large fusion/
    BERT GEMMs; static-int8 inside the Swin window kernels returns only
    "bf16 + a small margin" on the M=392 x K=256..1024 window shapes —
    modeled as 110 TF/s effective (the round-4 -4.1% encoder measurement,
    ROOFLINE §6). Round 4's implied_peak_frac > 1 came from dividing the
    int8_swins mix by the bf16-only 105 TF/s denominator.
    """
    swin_flops = {"tiny": 9.0e9, "small": 17.4e9, "base": 30.8e9}.get(
        swin_name, 9.0e9)
    bert_flops = 2.0 * 85e6 * text_len
    fusion_flops = 12.4e9 + 60e6 * text_len  # const (patch/seq) + per-token
    bf16, int8_big, int8_swin = 105e12, 151e12, 110e12
    if quant == "none":
        t = (swin_flops + bert_flops + fusion_flops) / bf16
    elif quant == "int8_swins":
        t = swin_flops / int8_swin + (bert_flops + fusion_flops) / int8_big
    else:  # round-3 "int8"/"int8_all" mixes: Swin bf16, BERT+fusion int8
        t = swin_flops / bf16 + (bert_flops + fusion_flops) / int8_big
    return 1.0 / t


def bench_embed(batch: int, text_len: int, use_pallas: bool, iters: int,
                quant: str = None):
    """-> (pairs/sec, fraction of the measured mixed-precision floor)."""
    import jax
    import jax.numpy as jnp

    quant = quant or os.environ.get("BENCH_QUANT", "int8_swins")
    model, cfg = _build_model(use_pallas, text_len, quant=quant)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((batch, 224, 224, 3), dtype=np.float32))
    ids = jnp.asarray(
        rng.integers(0, cfg.text.vocab_size, (batch, text_len)).astype(np.int32)
    )
    mask = jnp.ones((batch, text_len), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), img[:1], ids[:1], mask[:1])
    if os.environ.get("BENCH_BF16_PARAMS", "1") == "1":
        # serve-mode weights: bf16 params halve HBM weight traffic
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    def chained(params, img0, ids, mask):
        def body(img_c, _):
            out = model.apply(params, img_c, ids, mask)
            # serialize: next input depends on this output (O(1) extra work)
            img_next = img_c + out["joint_emb"].mean().astype(img_c.dtype) * 1e-12
            return img_next, ()

        final, _ = jax.lax.scan(body, img0, None, length=iters)
        return final.mean()

    fn = jax.jit(chained)
    t_c0 = time.perf_counter()
    _ = float(fn(params, img, ids, mask))  # compile + warmup (full chain)
    compile_s = time.perf_counter() - t_c0
    # median of several timed chains: dispatch jitter through the dev
    # tunnel is tens-of-ms scale (docs/ROOFLINE.md chip-state notes), so a
    # single chain carries avoidable noise; each repeat is a full chained
    # re-execution (same methodology as the warmup/timed pair before).
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    dts = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        _ = float(fn(params, img, ids, mask))  # scalar fetch forces all
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    throughput = batch * iters / dt
    bench_embed.last_spread = {  # picked up into BENCH_DETAILS by main()
        "dt_repeats_s": [round(x, 5) for x in dts],
        "spread_pct": round(100.0 * (max(dts) - min(dts)) / dt, 2),
        "compile_s": round(compile_s, 1),
    }

    swin_name = os.environ.get("BENCH_SWIN", "tiny")
    floor = _floor_pairs_per_sec(swin_name, text_len, quant)
    return throughput, throughput / floor


def bench_retrieval(n_gallery: int, dim: int = 1024, k: int = 10, iters: int = 64):
    """Chained per-query exact top-k -> ms/query on device."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    g = rng.standard_normal((n_gallery, dim)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    g_dev = jax.device_put(g)
    q0 = jnp.asarray(rng.standard_normal((1, dim)).astype(np.float32))

    def chained(q0, g):
        def body(q, _):
            s, idx = jax.lax.top_k(
                jnp.dot(q, g.T, preferred_element_type=jnp.float32), k
            )
            q_next = jnp.roll(q, 1, axis=1) + s.max() * 1e-12
            return q_next, ()

        final, _ = jax.lax.scan(body, q0, None, length=iters)
        return final.mean()

    fn = jax.jit(chained)
    _ = float(fn(q0, g_dev))
    t0 = time.perf_counter()
    _ = float(fn(q0, g_dev))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def _headline_line(throughput: float, swin_name: str, text_len: int,
                   quant: str, use_pallas: bool = True) -> dict:
    arch_tag = {"base": "swin_b", "small": "swin_s", "tiny": "swin_t"}.get(
        swin_name, swin_name)
    dtype_tag = ("int8s-serve" if quant == "int8_swins"
                 else "int8-serve" if quant.startswith("int8") else "bf16")
    if not use_pallas:
        dtype_tag += "-xla"
    return {
        "metric": f"pairs_embedded_per_sec_per_chip({arch_tag}"
        f"+clinbert_dims,L{text_len},{dtype_tag})",
        "value": round(throughput, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(throughput / 5000.0, 4),
    }


def _measure_variant(quant: str, batch: int, text_len: int, use_pallas: bool,
                     iters: int, details: dict) -> float:
    """Run one precision-mix variant; publish its line if it is the best
    so far. Returns throughput (0.0 on failure)."""
    swin_name = os.environ.get("BENCH_SWIN", "tiny")
    row = {"quant": quant}
    try:
        throughput, floor_frac = bench_embed(batch, text_len, use_pallas,
                                             iters, quant=quant)
        row.update({
            "embed_pairs_per_sec": throughput,
            "floor_frac": floor_frac,
            "embed_timing": getattr(bench_embed, "last_spread", None),
        })
    except Exception as e:  # noqa: BLE001 — record and continue
        row["error_embed"] = repr(e)
        throughput = 0.0
    key = quant if use_pallas else f"{quant}_xla"
    details.setdefault("variants", {})[key] = row
    with _LOCK:
        prev = _BEST["line"]
    if throughput > 0 and (prev is None or throughput > prev["value"]):
        _publish(line=_headline_line(throughput, swin_name, text_len, quant,
                                     use_pallas))
        # Print the improved line IMMEDIATELY: an external kill during any
        # later compile still finds it in the tail (LAST line wins).
        with _LOCK:
            print(json.dumps(_BEST["line"]), flush=True)
    _publish(details=details)
    return throughput


def _run_arm(quant: str, use_pallas: bool, batch: int, text_len: int,
             iters: int, details: dict) -> float:
    """One plan arm. The serving roll-chain kernel (default ON since the
    round-5 trio) is pinned OFF for the proven `int8` arm — its first
    Mosaic compile measured ~18 extra tunnel minutes (chain_trio arm C),
    which must never gate the guaranteed line. Ambient MMRP_SWIN_CHAIN
    (A/B tooling) is honored."""
    pin = quant == "int8" and os.environ.get("MMRP_SWIN_CHAIN") is None
    if pin:
        os.environ["MMRP_SWIN_CHAIN"] = "0"
    try:
        return _measure_variant(quant, batch, text_len, use_pallas, iters,
                                details)
    finally:
        if pin:
            del os.environ["MMRP_SWIN_CHAIN"]


def main() -> None:
    # Watchdog FIRST — backend init itself can hang through the tunnel.
    # SOFT 520 s: prints a parseable line early (the driver's own cap is
    # unknown; round-4's kill fired with nothing printed) and keeps
    # measuring. HARD 3300 s: rc=0 exit with the best line. The hard
    # budget is sized for a DEGRADED tunnel day: round-5 observed
    # helper-wide ~3-4x compile slowdowns (the proven int8 mix, 245-542 s
    # historically, failed to compile within 1500 s), so the plan opens
    # with the XLA-only arm and the hard cap leaves room for the Pallas
    # arm behind it.
    deadline_s = float(os.environ.get("BENCH_DEADLINE_S", "520"))
    hard_s = float(os.environ.get("BENCH_HARD_DEADLINE_S", "3300"))
    _start_watchdog(deadline_s, max(hard_s, deadline_s + 1.0))

    import jax

    setup_compile_cache()

    try:
        backend = jax.default_backend()
    except RuntimeError as e:
        # tunnel/backend init failure (observed: axon 'Unavailable' after a
        # long hang). Record the failure honestly as ONE parseable line
        # instead of crashing with no bench row at all; annotate (don't
        # clobber) the last good BENCH_DETAILS.
        details = {}
        try:
            with open("BENCH_DETAILS.json") as fh:
                details = json.load(fh)
        except (OSError, ValueError):
            pass
        details["error_backend_init"] = repr(e)
        _publish(
            line={
                "metric": "pairs_embedded_per_sec_per_chip(tpu-unavailable)",
                "value": 0.0,
                "unit": "pairs/s/chip",
                "vs_baseline": 0.0,
            },
            details=details,
        )
        _emit_and_exit(0)
    on_tpu = backend == "tpu"
    # headline = the FLAGSHIP parity architecture (Swin-B, reference
    # fusion.py:92). BENCH_SWIN=tiny selects the smaller stand-in, recorded
    # with its own clearly-labeled metric name.
    swin_name = os.environ.setdefault("BENCH_SWIN", "base" if on_tpu else "tiny")
    batch = int(os.environ.get(
        "BENCH_BATCH", ("64" if swin_name == "base" else "128") if on_tpu else "4"))
    text_len = int(os.environ.get("BENCH_TEXT_LEN", "64"))
    iters = 20 if on_tpu else 2
    # fused Pallas window attention is the default on TPU (measured +15%
    # over the best XLA formulation); BENCH_PALLAS=0 selects the XLA path
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    key = "pallas" if use_pallas else "xla"

    # Variant plan: an explicit BENCH_QUANT pins a single variant (A/B
    # tooling). Otherwise on TPU, arms are (quant, use_pallas), compiled
    # cheapest-first so SOME real flagship number lands as early as
    # possible even when the tunnel compile helper is degraded (round-5
    # observed helper-wide ~3-4x compile slowdowns — the same programs
    # that compiled in 250-550 s in round 4 ran >1500 s):
    #   1. `int8_all` XLA-only (no Mosaic kernels — fastest compile),
    #   2. the PROVEN round-3 `int8` Pallas mix (chain pinned off),
    #   3. the `int8_swins` static-quant upgrade (chain on).
    # Later arms only overwrite the printed line when they measure BETTER,
    # and each improvement is printed immediately (LAST line wins).
    pinned = os.environ.get("BENCH_QUANT")
    if pinned:
        plan = [(pinned, use_pallas)]
    elif on_tpu:
        plan = [("int8_all", False), ("int8", use_pallas),
                ("int8_swins", use_pallas)]
    else:
        plan = [("int8_swins", use_pallas)]

    details = {"backend": backend, "swin": swin_name, "batch": batch,
               "text_len": text_len, "attention_path": key,
               "method": "chained-scan, scalar fetch",
               "deadline_s": deadline_s,
               "plan": [q + ("" if up else "_xla") for q, up in plan]}

    best = _run_arm(plan[0][0], plan[0][1], batch, text_len, iters, details)

    try:
        n_gal = 100_000 if on_tpu else 2_000
        details[f"retrieval_ms_per_query_{n_gal//1000}k"] = bench_retrieval(n_gal)
    except Exception as e:  # noqa: BLE001
        details["error_retrieval"] = repr(e)
    _publish(details=details)

    # Upgrade attempts: each needs a fresh tunnel compile (persistent cache
    # is ineffective on axon — CLAUDE.md). Only attempt when enough budget
    # remains; the watchdog still guarantees the stashed line either way.
    min_upgrade_s = float(os.environ.get("BENCH_UPGRADE_MIN_S", "420"))
    for quant, up in plan[1:]:
        if _time_left() < min_upgrade_s:
            details["upgrade_skipped"] = {
                "quant": quant, "time_left_s": round(_time_left(), 1)}
            break
        t = _run_arm(quant, up, batch, text_len, iters, details)
        best = max(best, t)

    # merge separately-measured rows (same chained methodology, one model
    # build per process — see CLAUDE.md): training step (tools/bench_train.py)
    # and the Swin-B flagship embed (BENCH_FLAGSHIP=1 runs of this file)
    _merge_side_files(details)
    _publish(details=details)
    _emit_and_exit(0)


if __name__ == "__main__":
    main()
