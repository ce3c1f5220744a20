"""Model definitions: transition model (ParticleNet), particle-driven NeRF
renderer (RenderNet), NeRF MLP and positional encodings."""

from neurofluid_tpu.models.embedding import embedding_channels, positional_encoding  # noqa: F401
from neurofluid_tpu.models.nerf import NeRF  # noqa: F401
from neurofluid_tpu.models.particle_net import ContinuousConvLayer, ParticleNet  # noqa: F401
from neurofluid_tpu.models.render_net import RenderNet, camera_origin  # noqa: F401
