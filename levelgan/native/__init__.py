from levelgan.native.build import native_available, synthetic_corpus_native  # noqa: F401
