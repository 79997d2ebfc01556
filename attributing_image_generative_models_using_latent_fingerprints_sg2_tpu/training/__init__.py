"""GAN training for in-environment quality proofs.

The reference ships NO training code --- it fingerprints *pretrained*
generators (checkpoint loading only, ref src/PCA.py:40).  This package
goes beyond parity so the framework can prove the full
fingerprint -> attribute loop end-to-end without external weights: train
a small StyleGAN2 on procedural synthetic data (TPU-native, one jitted
scan-chunked step), then attribute against the trained generator and
measure real key-recovery bit accuracy (`cli/train.py`,
`make quality_selftrain`).
"""

from .data import sample_batch  # noqa: F401
from .gan import TrainConfig, TrainState, init_train_state, make_train_step  # noqa: F401
