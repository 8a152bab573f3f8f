"""The SLAM map as fixed-shape device state.

Replaces Core/MAGESLAM/Source/Map/{Map,ThreadSafeMap,MapPoint,CovisibilityGraph,
SpanningTree} and Containers/MapPointAssociations: keyframes and map points are
padded banks with validity masks; associations are a (K, N) int32 matrix;
the covisibility graph is derived by one matmul over the membership matrix.
No locks exist — the pipeline phases of the runtime (SURVEY §3.3) serialize
all writes by construction.
"""

from .map_state import MapState, empty_map  # noqa: F401
from .covisibility import covisibility_matrix, membership_matrix  # noqa: F401
