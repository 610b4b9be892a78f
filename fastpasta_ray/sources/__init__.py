from fastpasta_ray.sources.parquet import read_sequences, sequence_files  # noqa: F401
