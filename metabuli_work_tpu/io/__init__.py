from .fasta import read_fasta, read_fastq, read_seq_file, SeqRecord  # noqa: F401
