"""Per-task configs mirroring the reference's 13 config files
(hyperparameter values preserved; batch sizes are GLOBAL — the mesh shards
them over the data axis, replacing the reference's `// gpus` division)."""
