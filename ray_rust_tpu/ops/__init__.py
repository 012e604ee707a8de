from .rays import camera_rays
from .intersect import raycast, surface_normal, OUTONLY, INONLY
from .trace import raytrace, raymarch, shading, trace_image
from .march import march_single, distance_estimate, MarchResult
from .sky import default_sky, get_bg, BACKGROUNDS
from .texture import get_uv, lookup_diffuse
