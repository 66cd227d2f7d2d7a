from psld_tpu.models.ncsnpp import NCSNpp, NCSNppClassifier  # noqa: F401
