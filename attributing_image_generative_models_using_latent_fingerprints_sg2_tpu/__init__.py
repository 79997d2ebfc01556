"""TPU-native latent-fingerprinting framework for image generative models.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
repo `GuangyuNie/Attributing-Image-Generative-Models-using-Latent-Fingerprints-SG2`:

- StyleGAN2 synthesis in pure functional JAX (NHWC, MXU-friendly batched
  modulated convolutions instead of the reference's grouped-conv trick,
  reference: src/model.py:265-300).
- `upfirdn2d` and fused bias+LeakyReLU as XLA/Pallas ops (reference CUDA
  kernels: src/op/upfirdn2d_kernel.cu, src/op/fused_bias_act_kernel.cu).
- Device-side PCA of the W space (reference: src/PCA.py:62-108 does a
  GPU->CPU->sklearn round trip; here it is a single jitted eigh).
- Fingerprint embedding wx = U^T a + mu + c V^T S k and the gradient-based
  attribution solver (LPIPS + alpha-bound loss, LHS multi-start Adam) as one
  compiled TPU program, vmapped over restarts and samples and sharded over a
  device mesh (reference serial loops: src/main.py:45-89).
- Differentiable attacks (blur / noise / JPEG / combination) as pure
  functions usable inside jit (reference: src/attack_methods/).

Import as:

    import attributing_image_generative_models_using_latent_fingerprints_sg2_tpu as fp
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
