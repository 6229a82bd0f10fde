"""Config system: the reference's yaml schema, without yacs.

Parity surface: deep_hrnet/lib/config/default.py:17-130 (default tree),
:133-160 (yaml + dotted-override merge).  Public experiment yamls written
for the reference load unchanged here; ``MODEL.EXTRA`` stays an open
namespace (default.py:48 ``new_allowed=True``) so each architecture defines
its own keys.

Implementation is a ~100-line attribute-tree (no external dep): nested
:class:`Node` objects with dotted-path get/set, yaml merge, CLI ``opts``
merge (``KEY.SUBKEY value`` pairs), and freeze semantics.
"""

from .node import Node, load_config, default_config, update_config

__all__ = ["Node", "load_config", "default_config", "update_config"]
