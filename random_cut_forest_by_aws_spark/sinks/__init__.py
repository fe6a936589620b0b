from .shards import read_shard_manifest, write_packed_shards

__all__ = ["write_packed_shards", "read_shard_manifest"]
