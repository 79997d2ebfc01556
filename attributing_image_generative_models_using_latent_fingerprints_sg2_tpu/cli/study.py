"""Quality-study CLI: one-command reproduction of every headline quality
table (VERDICT r2 items 2/4/5).

Subcommands (all numbers at ``samples >= 20`` with Wilson 95% CIs):

- ``headline``: the flagship operating points (64px and 128px self-trained
  generators, key_len 32 and 64) re-measured with real statistics.
- ``robustness``: the reference's eval-strength attacks (Blur / Noise /
  Jpeg / Combination / Crop, attack_initializer semantics,
  /root/reference/src/attack_methods/attack_initializer.py:12-35) applied
  to the targets before the solve, one row per attack.
- ``scaling``: the key_len=64 scaling study --- bit accuracy vs generator
  scale (img_size x channel_max x training budget) WITH the w-space
  variance spectrum of the key band per model, so the "key band is under
  the small-generator noise floor" hypothesis is measured.
- ``capacity``: watermark-visibility (FID/LPIPS/MSE) vs accuracy grid
  (wraps eval.sweep at a fixed solver budget).
- ``perceptual``: solver-loss A/B (mse vs trained-discriminator features
  vs random-VGG LPIPS), clean + attacked --- the in-env instantiation of
  the reference's perceptual solver objective.

Each completed point is appended to ``<out>.jsonl`` immediately (crash
and resume safe --- finished points are skipped on re-run); the final
table also lands in ``<out>`` as JSON.

Run via ``make headline`` / ``make robustness`` / ``make scaling`` /
``make capacity``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

DEFAULT_CACHE = "/tmp/fp_ckpts"

# Scaling-study grid: (img_size, channel_max, train_steps).  Covers the
# VERDICT-prescribed axes {64,128,256}px x {128,256,512} x {3k,10k,30k}
# along the informative diagonal (9 models; the full 27-cell product
# would re-measure dominated cells).
SCALING_MODELS = [
    (64, 128, 3000),
    (64, 128, 30000),
    (64, 256, 10000),
    (128, 128, 3000),
    (128, 128, 30000),
    (128, 256, 10000),
    (128, 256, 30000),
    (256, 256, 10000),
    # 512-wide @256px trains at ~1-3 steps/s on one v5e chip; 10k steps
    # bounds the cell at ~1h (and t30000 is measured to HURT at 128px,
    # so the long-train cell carries no information worth 5+ hours).
    (256, 512, 10000),
]

ROBUSTNESS_ATTACKS = ["None", "Blur", "Noise", "Jpeg", "Combination", "Crop"]


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["headline", "robustness", "scaling",
                                   "capacity", "perceptual", "polish",
                                   "attackaware", "pruning",
                                   "identification", "bestrecipe",
                                   "model_attribution", "spectrum",
                                   "encoderinit"])
    p.add_argument("--out", type=str, default="")
    p.add_argument("--cache_dir", type=str, default=DEFAULT_CACHE,
                   help="trained-generator cache (.npz per recipe)")
    p.add_argument("--samples", type=int, default=20)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--chunk_samples", type=int, default=0,
                   help="solve in chunks of this many samples (memory bound); "
                        "0 = auto from the measured v5e worker-crash "
                        "envelope in chain*pixel*channel units (see "
                        "_auto_chunk: 200 chains OK @64px/cm128, 100 OK "
                        "@128px/cm128, 100 CRASHES @128px/cm256, 40 OK "
                        "there; 256px-wide models chunk the restarts "
                        "instead)")
    p.add_argument("--only", type=str, default="",
                   help="substring filter on the point tag (subset runs)")
    p.add_argument("--compile_cache", type=str, default="/tmp/jax_cache_fp")
    return p


def _load_done(jsonl_path: str) -> dict:
    from ..utils.io import read_jsonl_resumable

    if not os.path.exists(jsonl_path):
        return {}
    return {rec["tag"]: rec for rec in read_jsonl_resumable(jsonl_path)}


# Measured v5e worker-crash envelope, in chain*pixel*channel units
# (concurrent chains = chunk_samples * concurrent starts):
#   200 chains OK    @ 64px/cm128  -> 200*64^2*128 = 1.0e8
#   100 chains OK    @128px/cm128  -> 2.1e8
#   100 chains CRASH @128px/cm256  -> 4.2e8
#    40 chains OK    @128px/cm256  -> 1.7e8
# Safe activation budget ~2.1e8; chains additionally capped at 200 (the
# largest count ever measured OK) so small models don't extrapolate.
_CHAIN_BUDGET_UNITS = 2.1e8
_CHAIN_CAP = 200


def _auto_chunk(img_size: int, channel_max: int, n_eff: int):
    """(chunk_samples, chunk_starts) keeping concurrent chains inside the
    measured envelope.  When even ONE sample's n_eff restarts blow the
    budget (256px-wide models), the restarts are chunked instead ---
    attribute_chunked runs start-chunks sequentially at identical
    numerics."""
    unit = img_size * img_size * channel_max
    chains = max(1, min(_CHAIN_CAP, int(_CHAIN_BUDGET_UNITS // unit)))
    if chains >= n_eff:
        return max(1, chains // max(1, n_eff)), 0
    return 1, chains


def _run_points(args, point_specs, out_default: str) -> int:
    """point_specs: list of (tag, model_kwargs, eval_kwargs)."""
    import jax

    from ..eval import study

    out = args.out or out_default
    jsonl = out + ".jsonl"
    done = _load_done(jsonl)

    pipes = {}  # (ckpt, img, cm) -> pipeline, built lazily and reused

    results = list(done.values())
    for tag, mk, ek in point_specs:
        if args.only and args.only not in tag:
            continue
        if tag in done:
            print(f"[study] {tag}: cached ({done[tag]['mean_bit_acc']:.4f})")
            continue
        t0 = time.time()
        ckpt = study.ensure_trained(
            img_size=mk["img_size"], channel_max=mk["channel_max"],
            train_steps=mk["train_steps"], cache_dir=args.cache_dir,
            data_dim=mk.get("data_dim", 0),
        )
        pk = (ckpt, mk["img_size"], mk["channel_max"])
        if pk not in pipes:
            pipes.clear()  # one pipeline at a time (device memory)
            jax.clear_caches()
            pipes[pk] = study.build_study_pipeline(
                ckpt, img_size=mk["img_size"], channel_max=mk["channel_max"],
            )
        ek = dict(ek)
        factory = ek.pop("_lpips_factory", None)
        # The measured worker-crash envelope (_auto_chunk) is in CONCURRENT
        # CHAINS (= chunk * concurrent starts), sized by pixels x width ---
        # scale down when a point overrides n_starts (the pruning study's
        # n=40 rows) and fall back to restart-chunking when one sample
        # already exceeds the budget (256px-wide models).  Pruning needs
        # all restarts live in one program, so those rows never get
        # chunk_starts (their 64/128px operating points fit anyway).
        n_eff = max(1, ek.get("n_starts", args.n))
        chunk, chunk_starts = _auto_chunk(
            mk["img_size"], mk["channel_max"], n_eff
        )
        if ek.get("prune_starts"):
            chunk_starts = 0
        if args.chunk_samples:
            chunk, chunk_starts = args.chunk_samples, 0
        call_kw = dict(
            samples=args.samples, steps=args.steps, n_starts=args.n,
            seed=args.seed, chunk_samples=chunk, chunk_starts=chunk_starts,
            lpips_params=(factory() if factory is not None else None),
        )
        call_kw.update(ek)  # point spec overrides the defaults (e.g. n_starts)
        rec = study.eval_point(pipes[pk], **call_kw)
        rec["tag"] = tag
        rec["train_steps"] = mk["train_steps"]
        if mk.get("data_dim"):
            rec["data_dim"] = mk["data_dim"]
        rec["bit_sigma_spearman"] = study.bit_sigma_correlation(rec)
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        results.append(rec)
        print(
            f"[study] {tag}: bit_acc {rec['mean_bit_acc']:.4f} "
            f"(CI {rec['bit_acc_ci95'][0]:.4f}-{rec['bit_acc_ci95'][1]:.4f}), "
            f"exact {rec['exact_match_k']}/{rec['samples']} "
            f"(CI {rec['exact_match_ci95'][0]:.2f}-{rec['exact_match_ci95'][1]:.2f}), "
            f"band sigma med {rec['band_sigma_median']:.4f}, "
            f"{rec['wall_s']}s"
        )

    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[study] wrote {os.path.abspath(out)} ({len(results)} points)")
    return 0


def cmd_headline(args) -> int:
    """Flagship operating points with real statistics (n >= 20).

    256px is the reference's default img_size (/root/reference/src/
    params.py:12); its rows run at the same solver budget (the auto
    chunker serializes samples to stay inside the memory envelope)."""
    specs = []
    for img, cm, ts in [(64, 128, 3000), (128, 128, 3000),
                        (256, 128, 3000)]:
        mk = {"img_size": img, "channel_max": cm, "train_steps": ts}
        for kl, sig in [(32, 6.0), (64, 3.0), (64, 6.0)]:
            tag = f"{img}px_cm{cm}_t{ts}_kl{kl}_s{sig:g}"
            specs.append((tag, mk, {"key_len": kl, "sigma": sig}))
    return _run_points(args, specs, "result/study_headline.json")


def cmd_spectrum(args) -> int:
    """Does a steeper w-spectrum unlock key_len=64?  The round-3 scaling
    study measured that the in-env generators' flat spectrum (key-band
    sigma only ~3.5-4x below the content median) is what caps kl=64 bit
    accuracy at ~0.91, and asserted that production FFHQ models --- with
    far steeper spectra --- are the regime where kl=64 works.  This study
    tests the mechanism directly: train generators on rank-limited data
    (--data_dim caps the data manifold's intrinsic dimension,
    training/data.py _scene_lowdim), which forces the trained w-variance
    to concentrate on ~data_dim axes, and measure kl=64 recovery vs the
    spectrum ratio.  data_dim=0 rows are the full-draw anchor (the same
    cached model as the headline study)."""
    specs = []
    for d in (4, 8, 16, 0):
        mk = {"img_size": 64, "channel_max": 128, "train_steps": 3000,
              "data_dim": d}
        dtag = f"d{d}" if d else "dfull"
        for kl, sig in [(64, 3.0), (64, 6.0), (32, 6.0)]:
            tag = f"64px_cm128_t3000_{dtag}_kl{kl}_s{sig:g}"
            specs.append((tag, mk, {"key_len": kl, "sigma": sig}))
    return _run_points(args, specs, "result/study_spectrum.json")


def cmd_robustness(args) -> int:
    """Attack table at the flagship point (64px, kl=32, sigma=6)."""
    mk = {"img_size": 64, "channel_max": 128, "train_steps": 3000}
    specs = [
        (f"64px_kl32_s6_{atk}", mk, {"key_len": 32, "sigma": 6.0, "attack": atk})
        for atk in ROBUSTNESS_ATTACKS
    ]
    return _run_points(args, specs, "result/study_robustness.json")


def cmd_scaling(args) -> int:
    """key_len=64 accuracy + key-band spectrum vs generator scale."""
    specs = []
    for img, cm, ts in SCALING_MODELS:
        mk = {"img_size": img, "channel_max": cm, "train_steps": ts}
        for sig in (3.0, 6.0):
            tag = f"{img}px_cm{cm}_t{ts}_kl64_s{sig:g}"
            specs.append((tag, mk, {"key_len": 64, "sigma": sig}))
    return _run_points(args, specs, "result/study_scaling.json")


def cmd_perceptual(args) -> int:
    """Solver-loss A/B at the flagship point: mse vs the in-env
    perceptual backbones (trained-discriminator features, random-init
    VGG LPIPS), clean and under the attacks where a perceptual loss
    should earn its keep.  The reference's solver objective is LPIPS
    (/root/reference/src/main.py:63); round 2 measured random-VGG LPIPS
    WORSE than mse, so this table either instates a working perceptual
    mode (disc features, losses/disc_percept.py) or documents the
    negative with CIs.

    The ``*_cal`` variants additionally fit the lin heads with the
    reference's own 2AFC machinery (losses/lpips_train.py) on
    graded-distortion triplets (losses/calibrate.py) --- the in-env
    stand-in for the human-judgement data the reference trained on."""
    import jax

    from ..eval import study
    from ..losses.calibrate import calibrate_lin_heads, rank_accuracy
    from ..losses.disc_percept import load_disc_percept
    from ..losses.lpips import init_lpips_params

    mk = {"img_size": 64, "channel_max": 128, "train_steps": 3000}
    # Lazy: train (with the disc export) only when a backbone factory
    # actually runs --- a fully-cached jsonl must not retrain a wiped
    # /tmp checkpoint just to then skip every point.
    _ckpt_box: list = []

    def _ckpt() -> str:
        if not _ckpt_box:
            _ckpt_box.append(study.ensure_trained(
                img_size=mk["img_size"], channel_max=mk["channel_max"],
                train_steps=mk["train_steps"], cache_dir=args.cache_dir,
                need_disc=True,
            ))
        return _ckpt_box[0]

    def _calibrated(make_base, seed):
        cache = []  # fit once per backbone, not once per attack point ---
        # the seed is fixed, so re-fitting produces identical heads

        def factory():
            if not cache:
                base = make_base()
                r0 = rank_accuracy(base, size=mk["img_size"])
                fitted = calibrate_lin_heads(
                    base, key=jax.random.PRNGKey(seed), size=mk["img_size"]
                )
                r1 = rank_accuracy(fitted, size=mk["img_size"])
                print(f"[study] 2AFC calibration: rank acc {r0:.3f} -> {r1:.3f}")
                cache.append(fitted)
            return cache[0]

        return factory

    backbones = {
        "mse": (("mse",), None),
        "disc": (("perceptual",), lambda: load_disc_percept(_ckpt() + ".disc.npz")),
        "vgg_rand": (("perceptual",), lambda: init_lpips_params(jax.random.PRNGKey(0))),
        "disc_cal": (("perceptual",),
                     _calibrated(lambda: load_disc_percept(_ckpt() + ".disc.npz"), 11)),
        "vgg_cal": (("perceptual",),
                    _calibrated(lambda: init_lpips_params(jax.random.PRNGKey(0)), 12)),
    }
    specs = []
    for name in ["mse", "disc", "vgg_rand", "disc_cal", "vgg_cal"]:
        for atk in ["None", "Jpeg", "Noise", "Crop"]:
            tag = f"64px_kl32_s6_{name}_{atk}"
            (loss,), mkparams = backbones[name]
            specs.append(
                (tag, mk,
                 {"key_len": 32, "sigma": 6.0, "attack": atk, "loss": loss,
                  "_lpips_factory": mkparams})
            )
    return _run_points(args, specs, "result/study_perceptual.json")


def cmd_attackaware(args) -> int:
    """Attack-aware solving A/B at the flagship point: for each attack
    the target passed through, solve once normally (estimate compared
    raw, the reference objective src/main.py:62-63) and once pushing
    the estimate through the same deterministic channel model
    (AttributionConfig.solver_attack).  Compare ``*_aware`` rows against
    the matching study_robustness rows (same seeds and budget --- the
    only delta is the channel model in the loss)."""
    mk = {"img_size": 64, "channel_max": 128, "train_steps": 3000}
    specs = [
        (f"64px_kl32_s6_{atk}_aware", mk,
         {"key_len": 32, "sigma": 6.0, "attack": atk, "attack_aware": True})
        for atk in ["Blur", "Jpeg", "Crop", "Combination"]
    ]
    return _run_points(args, specs, "result/study_attackaware.json")


def cmd_encoderinit(args) -> int:
    """Amortized-encoder initialization A/B (fingerprint/encoder.py): the
    round-4 diagnosis says kl=64 exact-match failures are wrong-basin
    failures, so replace the blind centered-LHS restart init (ref
    src/main.py:46-52) with a learned inverter's prediction plus a local
    LHS cloud.  Rows re-solve the headline wall points (and every
    attacked operating point, with the encoder trained on the TRUE
    stochastic channel — see _train_chunk's design note) at the
    identical solver budget — the
    only delta is where the restart chains start.  Each record carries
    the encoder's own zero-step decode accuracy (``encoder_bit_acc``)
    and training wall time next to the solve results.

    The study is self-contained: every ``*_enc`` row has a matching
    ``*_lhs`` baseline row solved on the SAME retrained model with the
    same seeds and budget (the /tmp model cache does not survive between
    rounds, so pairing against the committed headline records would
    compare different training draws — the round-4 campaign re-measured
    its baselines for the same reason)."""
    mk = {"img_size": 64, "channel_max": 128, "train_steps": 3000}
    mk128 = {"img_size": 128, "channel_max": 128, "train_steps": 3000}
    points = [
        ("64px_cm128_t3000_kl64_s6", mk, {"key_len": 64, "sigma": 6.0}),
        ("64px_cm128_t3000_kl64_s3", mk, {"key_len": 64, "sigma": 3.0}),
        ("64px_cm128_t3000_kl32_s6", mk, {"key_len": 32, "sigma": 6.0}),
        ("128px_cm128_t3000_kl64_s6", mk128, {"key_len": 64, "sigma": 6.0}),
        ("64px_kl32_s6_Crop", mk,
         {"key_len": 32, "sigma": 6.0, "attack": "Crop"}),
        ("64px_kl32_s6_Jpeg", mk,
         {"key_len": 32, "sigma": 6.0, "attack": "Jpeg"}),
        ("64px_kl32_s6_Blur", mk,
         {"key_len": 32, "sigma": 6.0, "attack": "Blur"}),
        ("64px_kl32_s6_Noise", mk,
         {"key_len": 32, "sigma": 6.0, "attack": "Noise"}),
        ("64px_kl32_s6_Combination", mk,
         {"key_len": 32, "sigma": 6.0, "attack": "Combination"}),
    ]
    specs = []
    for tag, mks, ek in points:
        specs.append((f"{tag}_lhs", mks, dict(ek)))
        specs.append((f"{tag}_enc", mks, {**ek, "init": "encoder"}))
        if ek.get("attack", "None") != "None":
            # composition rows on the attacked points: attack-aware solving
            # alone (round-4's best per-condition recipe) and attack-aware
            # stacked with the encoder init — all four cells on the same
            # model draw so the deltas are same-model/same-seeds
            specs.append((f"{tag}_aware", mks, {**ek, "attack_aware": True}))
            specs.append((f"{tag}_encaware", mks,
                          {**ek, "init": "encoder", "attack_aware": True}))
    # encoder-budget scaling at the kl=64 wall points: 4x training steps
    # (amortized pretraining, not solver budget — the solve stays
    # budget-matched), and a wider exploration cloud at the bigger budget
    for tag, mks in (("128px_cm128_t3000_kl64_s6", mk128),
                     ("64px_cm128_t3000_kl64_s6", mk)):
        base = {"key_len": 64, "sigma": 6.0, "init": "encoder"}
        specs.append((f"{tag}_enc6k", mks, {**base, "encoder_steps": 6000}))
        specs.append((f"{tag}_enc6kj50", mks,
                      {**base, "encoder_steps": 6000, "encoder_jitter": 0.5}))
        specs.append((f"{tag}_enc24k", mks, {**base, "encoder_steps": 24000}))
    # the reference's headline resolution (256px, src/params.py): blind
    # vs saturated-budget encoder at kl=64, extending the measured
    # resolution trend (64px ~0.94, 128px ~0.985)
    mk256 = {"img_size": 256, "channel_max": 128, "train_steps": 3000}
    specs.append(("256px_cm128_t3000_kl64_s6_lhs", mk256,
                  {"key_len": 64, "sigma": 6.0}))
    # batch 16 (not the 64 default): a 64-image 256px render inside the
    # training scan crashed the TPU worker (same memory envelope
    # _auto_chunk guards for solves); 4x the steps keeps the sample
    # count at the measured 6000x64 saturation point
    specs.append(("256px_cm128_t3000_kl64_s6_enc6k", mk256,
                  {"key_len": 64, "sigma": 6.0, "init": "encoder",
                   "encoder_steps": 24000, "encoder_batch": 16}))
    return _run_points(args, specs, "result/study_encoderinit.json")


def cmd_pruning(args) -> int:
    """Restart-pruning (successive halving) A/B at the flagship points:
    the same operating points as study_headline, re-solved with all 20
    restarts warmed for 25% of the schedule then pruned to the best 5
    (compute = 0.25 + 0.75*5/20 = 44% of the full solve), plus a
    reinvestment row that spends part of the savings on more restarts
    (n=40 pruned to 8: 0.25*40/20 + 0.75*8/20 = 0.80x the baseline
    compute --- wider exploration at a still-cheaper budget).  Compare
    row-for-row against study_headline.json and each row's wall_s."""
    specs = []
    for img, cm, ts in [(64, 128, 3000), (128, 128, 3000)]:
        mk = {"img_size": img, "channel_max": cm, "train_steps": ts}
        for kl, sig in [(32, 6.0), (64, 6.0)]:
            base = {"key_len": kl, "sigma": sig}
            specs.append(
                (f"{img}px_cm{cm}_t{ts}_kl{kl}_s{sig:g}_prune20to5", mk,
                 {**base, "prune_starts": 5}))
            specs.append(
                (f"{img}px_cm{cm}_t{ts}_kl{kl}_s{sig:g}_n40prune8", mk,
                 {**base, "prune_starts": 8, "n_starts": 40}))
    return _run_points(args, specs, "result/study_pruning.json")


def cmd_polish(args) -> int:
    """Discrete bit-polish A/B (attribute.polish_key_bits wired through
    AttributionConfig.polish_sweeps): the headline operating points
    re-solved with 2 greedy bit-flip sweeps after the continuous solve.
    Compare row-for-row against study_headline.json (same seeds, same
    solver budget; the continuous trajectory is shared, so any delta is
    the polish).

    Historical rows in the jsonl record the measured dead ends that
    shaped the current design (see _polish_loop's docstring): the
    ``_polish2`` rows hard-rounded the converged soft bits before
    descending (raises the loss ~30x, destroys correct keys) and the
    ``_polish2_m5`` rows added an accept margin on top (still worse
    than no polish).  The live ``_soft`` rows descend over logit SIGNS
    from the converged soft state with a 5% accept margin."""
    specs = []
    for img, cm, ts in [(64, 128, 3000), (128, 128, 3000)]:
        mk = {"img_size": img, "channel_max": cm, "train_steps": ts}
        for kl, sig in [(32, 6.0), (64, 3.0), (64, 6.0)]:
            tag = f"{img}px_cm{cm}_t{ts}_kl{kl}_s{sig:g}_polish2_soft"
            specs.append(
                (tag, mk,
                 {"key_len": kl, "sigma": sig, "polish_sweeps": 2,
                  "polish_margin": 0.05})
            )
    return _run_points(args, specs, "result/study_polish.json")


def cmd_bestrecipe(args) -> int:
    """The composed best-recipe solver, budget-matched to the headline
    rows (VERDICT r3 item 3): every round-3 solver improvement stacked
    in one configuration ---

    - **wider exploration, same compute**: n=50 LHS restarts warmed for
      25% of the schedule, pruned to the best 10 (executed chain-steps =
      0.25*2000*50 + 0.75*2000*10 = 40,000/sample = exactly the headline
      budget of 20 restarts x 2000 steps);
    - **soft-sign polish** (2 sweeps, 5% accept margin) on the converged
      state;
    - on ATTACKED rows additionally **attack-aware solving** (the
      deterministic channel model in the loss) with the
      **trained-discriminator perceptual loss** --- the winning mode per
      attack from study_perceptual.

    Clean rows pair with study_headline, attacked rows with
    study_robustness (same seeds and budget; the report renders the
    deltas).  Finding 1 ("failures are optimization failures") predicts
    the stack is worth real percentage points at the kl=64 wall --- this
    measures it."""
    from ..eval import study
    from ..losses.disc_percept import load_disc_percept

    recipe = {
        # 0.25*2000*50 + 0.75*2000*10 = 40,000 chain-steps/sample ==
        # the headline budget (20 x 2000); asserted budget-matched in
        # tests/test_study_driver.py::test_bestrecipe_specs_budget_matched
        "n_starts": 50, "prune_starts": 10, "prune_frac": 0.25,
        "polish_sweeps": 2, "polish_margin": 0.05,
    }
    specs = []
    for img in (64, 128):
        mk = {"img_size": img, "channel_max": 128, "train_steps": 3000}
        for kl, sig in [(32, 6.0), (64, 3.0), (64, 6.0)]:
            tag = f"{img}px_cm128_t3000_kl{kl}_s{sig:g}_best"
            specs.append((tag, mk, {"key_len": kl, "sigma": sig, **recipe}))

    # attacked composition at the flagship point: + channel model in the
    # loss + disc-feature objective (study_perceptual's per-attack winner)
    mk64 = {"img_size": 64, "channel_max": 128, "train_steps": 3000}
    _ckpt_box: list = []

    def _disc_factory():
        if not _ckpt_box:
            ckpt = study.ensure_trained(
                img_size=64, channel_max=128, train_steps=3000,
                cache_dir=args.cache_dir, need_disc=True,
            )
            _ckpt_box.append(load_disc_percept(ckpt + ".disc.npz"))
        return _ckpt_box[0]

    for atk in ("Jpeg", "Crop"):
        specs.append((
            f"64px_kl32_s6_{atk}_best", mk64,
            {"key_len": 32, "sigma": 6.0, "attack": atk,
             "attack_aware": True, "loss": "perceptual",
             "_lpips_factory": _disc_factory, **recipe},
        ))
    return _run_points(args, specs, "result/study_bestrecipe.json")


def cmd_model_attribution(args) -> int:
    """Measured model-level attribution (VERDICT r3 item 4): a registry
    of 4 independently trained generators (same recipe, training seeds
    0-3 --- the hardest closed-set case) plus a held-out generator
    (seed 4) that is NOT in the registry, probing the open set.  Reports
    closed-set decision accuracy with CIs, margin distributions, the
    calibrated open-set operating point, and the full threshold-sweep
    curve (eval/model_attribution_study.py).  The reference assumes the
    generator is known (/root/reference/src/main.py:45-89)."""
    import jax

    from ..eval import study
    from ..eval.model_attribution_study import model_attribution_point

    out = args.out or "result/study_model_attribution.json"
    jsonl = out + ".jsonl"
    done = _load_done(jsonl)
    recs = list(done.values())

    points = [
        ("modelattr_64px_kl32_s6", {"key_len": 32, "sigma": 6.0}),
        ("modelattr_64px_kl64_s6", {"key_len": 64, "sigma": 6.0}),
    ]
    pipes_box: dict = {}

    def _pipes():
        """Registry seeds 0-3 + held-out seed 4, trained + PCA'd once."""
        if pipes_box:
            return pipes_box
        for s in range(5):
            ckpt = study.ensure_trained(
                img_size=64, channel_max=128, train_steps=3000,
                cache_dir=args.cache_dir, seed=s,
            )
            name = f"seed{s}"
            pipes_box[name] = study.build_study_pipeline(
                ckpt, img_size=64, channel_max=128,
            )
        return pipes_box

    for tag, kw in points:
        if args.only and args.only not in tag:
            continue
        if tag in done:
            print(f"[study] {tag}: cached "
                  f"(decision acc {done[tag]['decision_acc']:.3f})")
            continue
        pipes = _pipes()
        registry = {n: pipes[n] for n in ("seed0", "seed1", "seed2", "seed3")}
        held_out = {"seed4": pipes["seed4"]}
        t0 = time.time()
        rec = model_attribution_point(
            registry, held_out,
            samples_per_model=args.samples,
            seed=args.seed,
            chunk_samples=(args.chunk_samples
                           or _auto_chunk(64, 128, 8)[0]),
            **kw,
        )
        rec["tag"] = tag
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        recs.append(rec)
        print(f"[study] {tag}: decision acc {rec['decision_acc']:.3f} "
              f"(CI {rec['decision_acc_ci95'][0]:.2f}-"
              f"{rec['decision_acc_ci95'][1]:.2f}), "
              f"FR@thr {rec['false_reject_at_threshold']:.3f}, "
              f"FA@thr {rec['false_accept_at_threshold']:.3f}, "
              f"loss AUC {rec['open_set_auc']:.3f}, "
              f"margin AUC "
              f"{rec.get('margin_open_set_auc') or float('nan'):.3f}, "
              f"{rec['wall_s']}s")
    with open(out, "w") as f:
        json.dump(recs, f, indent=2)
    print(f"[study] wrote {os.path.abspath(out)} ({len(recs)} points)")
    return 0


def cmd_capacity(args) -> int:
    """Watermark visibility vs accuracy (FID/LPIPS/MSE), fixed budget."""
    import jax

    from ..config import AttributionConfig, ModelConfig
    from ..eval import study
    from ..eval.sweep import run_sweep

    ckpt = study.ensure_trained(
        img_size=64, channel_max=128, train_steps=3000,
        cache_dir=args.cache_dir, need_disc=True,
    )
    from ..checkpoints.flat import unflatten_params
    import numpy as np

    disc_params = jax.tree.map(
        jax.numpy.asarray, unflatten_params(dict(np.load(ckpt + ".disc.npz")))
    )
    mcfg = ModelConfig(img_size=64, channel_max=128, ckpt=ckpt)
    samples = max(8, args.samples // 2)
    pts = run_sweep(
        jax.random.PRNGKey(args.seed),
        mcfg,
        key_lens=(32, 64),
        sigmas=(3.0, 6.0),
        samples=samples,
        acfg=AttributionConfig(steps=500, n_starts=8, loss="mse"),
        ckpt_path=ckpt,
        with_fid=True,
        dtype="bfloat16",
        disc_params=disc_params,
    )
    # Re-solve the same grid (same PRNG key => identical targets) at the
    # FULL headline budget (steps/n from the CLI, default 2000/20) so the
    # table reads at the same operating point as the headline rows ---
    # the round-3 "budget trap" fix (the 500/8 bit-acc column understates
    # recoverability next to the FID columns).
    import dataclasses as _dc

    pts_full = run_sweep(
        jax.random.PRNGKey(args.seed),
        mcfg,
        key_lens=(32, 64),
        sigmas=(3.0, 6.0),
        samples=samples,
        acfg=AttributionConfig(steps=args.steps, n_starts=args.n, loss="mse"),
        ckpt_path=ckpt,
        with_fid=False,
        dtype="bfloat16",
    )
    recs = [_dc.asdict(p) for p in pts]
    full_by_key = {(p.key_len, p.sigma, p.shift): p for p in pts_full}
    for r in recs:
        fp = full_by_key.get((r["key_len"], r["sigma"], r["shift"]))
        r["mean_bit_acc_full"] = fp.mean_bit_acc if fp else None
        r["attribution_acc_full"] = fp.attribution_acc if fp else None
        r["full_budget"] = f"{args.steps}/{args.n}"
        r["samples"] = samples
    out = args.out or "result/study_capacity.json"
    with open(out, "w") as f:
        json.dump(recs, f, indent=2)
    print(f"[study] wrote {os.path.abspath(out)} ({len(recs)} points, "
          f"incl. full-budget bit-acc column)")
    return 0


def cmd_identification(args) -> int:
    """Measured user identification vs registry size (eval/identification):
    solve once at the flagship operating point, decode the planted user
    against growing registries (soft ML vs hard Hamming), with the union
    bound the measured per-bit error rate implies."""
    from ..eval import study
    from ..eval.identification import identification_point

    out = args.out or "result/study_identification.json"
    jsonl = out + ".jsonl"
    done = _load_done(jsonl)  # crash/resume safe, like every other study
    recs = list(done.values())
    pipe = None
    # Flagship operating point (kl=32, d_min=6) clean + the two hardest
    # attacks, then the REFERENCE's key length (kl=64, src/params.py:18,
    # VERDICT r3 item 5) at both sigmas: d_min=12 is scaled to the
    # measured per-bit error (p_bit ~0.09-0.18 at kl=64 => ~6-12 expected
    # flips; hard decoding corrects <=5, so accuracy at large N must come
    # from SOFT decoding --- exactly what the table measures) and still
    # GV-packs >=1e5 users (issuance verified: full pairwise min distance
    # 12 at N=1e5).  Registry sizes reach 1e5: decode is an [N, K] matmul.
    id_points = [
        ("kl32_s6_None",
         dict(key_len=32, sigma=6.0, min_distance=6,
              registry_sizes=(10, 100, 1000), attack="None")),
        ("kl32_s6_Jpeg",
         dict(key_len=32, sigma=6.0, min_distance=6,
              registry_sizes=(10, 100, 1000), attack="Jpeg")),
        ("kl32_s6_Crop",
         dict(key_len=32, sigma=6.0, min_distance=6,
              registry_sizes=(10, 100, 1000), attack="Crop")),
        ("kl64_s6_None",
         dict(key_len=64, sigma=6.0, min_distance=12,
              registry_sizes=(10, 100, 1000, 10000, 100000),
              attack="None")),
        ("kl64_s3_None",
         dict(key_len=64, sigma=3.0, min_distance=12,
              registry_sizes=(10, 100, 1000, 10000, 100000),
              attack="None")),
        # capacity under attack at the reference key length (s3 is the
        # measured better kl=64 operating point: lower p_bit because the
        # target stays on-manifold)
        ("kl64_s3_Jpeg",
         dict(key_len=64, sigma=3.0, min_distance=12,
              registry_sizes=(10, 100, 1000, 10000, 100000),
              attack="Jpeg")),
        ("kl64_s3_Crop",
         dict(key_len=64, sigma=3.0, min_distance=12,
              registry_sizes=(10, 100, 1000, 10000, 100000),
              attack="Crop")),
        # same attacked points solved ATTACK-AWARE (the deployment mode:
        # the provider knows it is testing robustness to a channel it can
        # model; +18.6pp bit acc on Crop at kl=32 in the round-4 campaign)
        ("kl64_s3_Jpeg_aware",
         dict(key_len=64, sigma=3.0, min_distance=12,
              registry_sizes=(10, 100, 1000, 10000, 100000),
              attack="Jpeg", attack_aware=True)),
        ("kl64_s3_Crop_aware",
         dict(key_len=64, sigma=3.0, min_distance=12,
              registry_sizes=(10, 100, 1000, 10000, 100000),
              attack="Crop", attack_aware=True)),
        # Reed-Muller structured issuance (fingerprint/keys.py issue_rm):
        # RM(2,6) guarantees pairwise distance 16 (vs 12 from rejection
        # sampling) and issues in milliseconds where the O(N^2) sampler
        # cannot go --- the N=1e6 rows answer where the round-4 "~1e7
        # users before the soft margin crosses zero" extrapolation
        # actually lands, clean and through the attack-aware channel.
        ("kl64_s3_None_rm",
         dict(key_len=64, sigma=3.0, issuance="rm",
              registry_sizes=(1000, 10000, 100000, 1000000),
              attack="None")),
        ("kl64_s3_Jpeg_aware_rm",
         dict(key_len=64, sigma=3.0, issuance="rm",
              registry_sizes=(1000, 10000, 100000, 1000000),
              attack="Jpeg", attack_aware=True)),
        ("kl64_s3_Crop_aware_rm",
         dict(key_len=64, sigma=3.0, issuance="rm",
              registry_sizes=(1000, 10000, 100000, 1000000),
              attack="Crop", attack_aware=True)),
        # round-5: the same N=1e6 frontier rows solved with the amortized
        # encoder init (BASELINE encoderinit study: better at every
        # measured point; lower p_bit compounds through the soft-decode
        # margins exactly where large registries need it)
        ("kl64_s3_None_rm_enc",
         dict(key_len=64, sigma=3.0, issuance="rm",
              registry_sizes=(1000, 10000, 100000, 1000000),
              attack="None", init="encoder")),
        ("kl64_s3_Jpeg_encaware_rm",
         dict(key_len=64, sigma=3.0, issuance="rm",
              registry_sizes=(1000, 10000, 100000, 1000000),
              attack="Jpeg", attack_aware=True, init="encoder")),
        ("kl64_s3_Crop_encaware_rm",
         dict(key_len=64, sigma=3.0, issuance="rm",
              registry_sizes=(1000, 10000, 100000, 1000000),
              attack="Crop", attack_aware=True, init="encoder")),
    ]
    for suffix, kw in id_points:
        tag = f"ident_64px_{suffix}"
        if args.only and args.only not in tag:
            continue
        if tag in done:
            print(f"[study] {tag}: cached "
                  f"(bit acc {done[tag]['mean_bit_acc']:.4f})")
            continue
        if pipe is None:
            ckpt = study.ensure_trained(
                img_size=64, channel_max=128, train_steps=3000,
                cache_dir=args.cache_dir,
            )
            pipe = study.build_study_pipeline(
                ckpt, img_size=64, channel_max=128
            )
        t0 = time.time()
        rec = identification_point(
            pipe,
            samples=args.samples, steps=args.steps, n_starts=args.n,
            seed=args.seed,
            chunk_samples=(
                args.chunk_samples
                or _auto_chunk(64, 128, max(1, args.n))[0]
            ),
            **kw,
        )
        rec["tag"] = tag
        rec["wall_s"] = round(time.time() - t0, 1)
        with open(jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        recs.append(rec)
        print(f"[study] {tag}: p_bit {rec['measured_p_bit']:.4f} "
              f"(bit acc {rec['mean_bit_acc']:.4f}), {rec['wall_s']}s")
        for row in rec["by_registry_size"]:
            print(
                f"[study]   N={row['registry_size']}: soft "
                f"{row['soft_accuracy']:.3f} "
                f"(CI {row['soft_ci95'][0]:.2f}-{row['soft_ci95'][1]:.2f}), "
                f"hard {row['hard_accuracy']:.3f}, "
                f"margin {row['mean_margin_nats']:.1f} nats, "
                f"union bound err <= {row['union_bound_error']:.3g}"
            )
    with open(out, "w") as f:
        json.dump(recs, f, indent=2)
    print(f"[study] wrote {os.path.abspath(out)} ({len(recs)} points)")
    return 0


def main(argv=None) -> int:
    args = _parser().parse_args(argv)
    import jax

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.makedirs("result", exist_ok=True)
    return {
        "headline": cmd_headline,
        "robustness": cmd_robustness,
        "scaling": cmd_scaling,
        "capacity": cmd_capacity,
        "perceptual": cmd_perceptual,
        "polish": cmd_polish,
        "attackaware": cmd_attackaware,
        "pruning": cmd_pruning,
        "identification": cmd_identification,
        "bestrecipe": cmd_bestrecipe,
        "model_attribution": cmd_model_attribution,
        "spectrum": cmd_spectrum,
        "encoderinit": cmd_encoderinit,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
