from .records import ChainPair, Partition
from .reader import ingest, load_chains, parse_chain_file, resolve_chain_files
from . import preprocess
