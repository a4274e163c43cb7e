from kgw_ray.state.manifest import StageManifest, resumable_stage  # noqa: F401
