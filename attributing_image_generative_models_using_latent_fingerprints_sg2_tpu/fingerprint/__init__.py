"""Fingerprint core: PCA basis, key embedding, attribution solver, pipeline.

Submodules keep their names importable (``from ...fingerprint import
attribute as attr`` is the canonical usage); only non-shadowing symbols are
re-exported here (the functions ``attribute.attribute`` and ``embed.embed``
would otherwise shadow their own submodules).
"""

from . import attribute, embed, pca, pipeline  # noqa: F401
from .attribute import AttributionResult, evaluate_attribution  # noqa: F401
from .embed import (  # noqa: F401
    FingerprintBasis,
    alpha_bound_penalty,
    bit_accuracy,
    build_basis,
    key_offset,
    sample_alpha,
    sample_key_bits,
)
from .pca import PCABasis, pca_from_samples, perform_pca_for_params  # noqa: F401
from .pipeline import (  # noqa: F401
    Pipeline,
    augment,
    build_pipeline,
    generate_fingerprinted,
    get_watermarked_images,
    synthesize,
)
