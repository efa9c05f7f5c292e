from aline_tpu.models.aline import Aline, build_model
from aline_tpu.models.embedder import Embedder, MLPEmbed
from aline_tpu.models.encoder import Encoder, EncoderLayer
from aline_tpu.models.heads import (
    AcquisitionHead,
    AlineOutput,
    ContinuousAcquisitionHead,
    ContinuousDesignOut,
    ContinuousOutputHead,
    DesignOut,
    GMMParams,
    GMMTargetHead,
    OutputHead,
    ValueHead,
)
