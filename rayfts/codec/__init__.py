from rayfts.codec.varint import encode_varints, decode_varints  # noqa: F401
from rayfts.codec.postings import (  # noqa: F401
    PostingList,
    encode_postings,
    decode_postings,
    BLOCK_SIZE,
)
from rayfts.codec.fieldnorm import FieldNormCodec  # noqa: F401
