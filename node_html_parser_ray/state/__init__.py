from .manifest import ShardManifest

__all__ = ["ShardManifest"]
