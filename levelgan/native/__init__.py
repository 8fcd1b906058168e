from levelgan.native.build import (native_available,  # noqa: F401
                                   synthetic_corpus_native,
                                   unpack_native_available,
                                   unpack_planes_native)
