from .format import KmerIndex, load_index, DB_META_NAME  # noqa: F401
