from .text import decode_ruby, encode_rubyhtml, codes_to_text  # noqa: F401
