from psld_tpu.eval.fid.inception import (  # noqa: F401
    FID_DIM,
    extract_features,
    load_torch_checkpoint,
    make_feature_fn,
    random_params,
)
from psld_tpu.eval.fid.stats import (  # noqa: F401
    FeatureMoments,
    frechet_distance,
    load_stats,
    save_stats,
)
