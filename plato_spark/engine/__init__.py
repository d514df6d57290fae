from plato_spark.engine.checkpoint import CheckpointManager  # noqa: F401
from plato_spark.engine.superstep import SuperstepDriver  # noqa: F401
