"""CPU f64 oracle implementations (scipy / OpenCV) used to validate the
TPU solvers and pipeline against Ceres-grade numerics. Never imported by
the TPU compute path."""
