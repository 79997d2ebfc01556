# Convenience targets for the TPU-native latent-fingerprinting framework.

PY ?= python

.PHONY: all native test test-fast bench bench_dataload dryrun parity \
        quality_selftrain headline robustness scaling capacity perceptual \
        polish attackaware report pruning identification bestrecipe \
        model_attribution spectrum encoderinit clean

all: native

native:
	$(MAKE) -C native

test: native
	$(PY) -m pytest tests/ -q

test-fast: native
	$(PY) -m pytest tests/ -q -x -k "not e2e and not sharding and not cli"

bench:
	$(PY) bench.py

bench_dataload: native
	$(PY) bench.py --preset dataload

dryrun:
	JAX_PLATFORM_NAME=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  $(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as g; g.dryrun_multichip(8)"

# Quality-parity readiness: the >=95% bit-acc north-star check
# (BASELINE.json config 2: steps=200, sample_size=5, n=4; ref defaults
# /root/reference/src/main.py:93-154) the moment real weights exist.
#   make parity CKPT=ffhq-550000.pt VGG=vgg16.pth LIN=lpips_vgg.pth
# Writes per-sample bit acc + attribution acc to result/parity/.../result.txt.
parity:
	@test -n "$(CKPT)" || (echo "usage: make parity CKPT=<rosinality.pt> [VGG=<vgg16 state dict>] [LIN=<lpips vgg.pth>]"; exit 1)
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.attribute \
	  --ckpt $(CKPT) $(if $(VGG),--lpips_vgg $(VGG)) $(if $(LIN),--lpips_lin $(LIN)) \
	  --img_size 256 --key_len 64 --shift 448 --sigma 1 \
	  --steps 200 --sample_size 5 --n 4 --dtype bfloat16 \
	  --save_dir ./result/parity/

# Self-contained quality proof (no external weights needed): train a
# small StyleGAN2 on the procedural distribution (training/data.py), then
# run the fingerprint -> attribute loop against the TRAINED generator and
# report real key-recovery bit accuracy.  Measured (BASELINE.md): mean
# bit acc 0.975 / exact-match 0.40 at this operating point (chance 0.5).
SELFTRAIN_CKPT ?= /tmp/selftrain64.npz
quality_selftrain:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.train \
	  --img_size 64 --channel_max 128 --steps 3000 --batch 16 --chunk 150 \
	  --out $(SELFTRAIN_CKPT)
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.attribute \
	  --ckpt $(SELFTRAIN_CKPT) --img_size 64 --channel_max 128 \
	  --key_len 32 --shift 480 --sigma 6 --loss mse \
	  --steps 2000 --sample_size 5 --n 20 \
	  --save_dir ./result/selftrain/

# One-command reproduction of the BASELINE.md quality tables (VERDICT r2
# items 2/4/5).  All points: samples>=20, Wilson 95% CIs, reference solver
# budget (steps=2000, n=20), self-trained generators cached in /tmp/fp_ckpts.
# Each finished point appends to result/study_*.json.jsonl (resume-safe).
headline:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study headline

robustness:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study robustness

scaling:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study scaling

capacity:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study capacity

perceptual:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study perceptual

polish:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study polish

attackaware:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study attackaware

pruning:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study pruning

identification:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study identification

# Encoder-initialized solving (round-5): amortized inverter trained on
# frozen-generator pairs replaces the blind LHS restart init; A/B against
# the matching headline/robustness rows at identical solver budget.
encoderinit:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study encoderinit

# Composed best-recipe solver (round-4): pruning-reinvested restarts +
# soft-sign polish (+ attack-aware disc-feature loss on attacked rows),
# budget-matched to the headline rows.
bestrecipe:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study bestrecipe

# Model-level attribution study (round-4): decision accuracy + open-set
# operating curve over a registry of 4 trained generators + 1 held-out.
model_attribution:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study model_attribution

# Round-5: does a steeper w-spectrum unlock key_len=64?  Trains
# generators on rank-limited data (--data_dim) and measures kl=64
# recovery vs the key-band/content spectrum ratio.
spectrum:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study spectrum

# Render every BASELINE.md quality table from the measured study records
# (no TPU needed --- a mechanical markdown render of result/study_*.jsonl).
report:
	$(PY) -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.report

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
