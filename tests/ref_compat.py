"""Compatibility shims for running the REFERENCE's transformers-based
processor classes under the transformers version installed in this image.

Two gaps between the reference's pinned transformers and ours:

* ``ProcessorMixin.check_argument_for_proper_class`` resolves attribute
  classes via ``get_possibly_dynamic_module``, which iterates
  ``VIDEO_PROCESSOR_MAPPING._extra_content`` — but without torchvision this
  mapping is a ``DummyObject`` placeholder with no ``_extra_content`` and
  the lookup raises AttributeError before ever reaching our class names.
* The reference's custom attribute classes (``CM3PBeatmapParser``,
  ``CM3PBeatmapTokenizer``, ``CM3PMetadataTokenizer``,
  processing_cm3p.py:214-218) are not registered with any Auto class, so
  the mapping scan must actually find them somewhere.

``install(*classes)`` patches the dummy mapping with an empty
``_extra_content`` and registers the given classes into
``TOKENIZER_MAPPING._extra_content`` under unique sentinel keys (the scan
only reads ``.values()``; keys are never used for processor attribute
resolution).
"""
from __future__ import annotations


def install(*custom_classes) -> None:
    import transformers

    for name in (
        "IMAGE_PROCESSOR_MAPPING",
        "VIDEO_PROCESSOR_MAPPING",
        "TOKENIZER_MAPPING",
        "FEATURE_EXTRACTOR_MAPPING",
        "MODEL_FOR_AUDIO_TOKENIZATION_MAPPING",
    ):
        mapping = getattr(transformers, name, None)
        if mapping is not None and not hasattr(mapping, "_extra_content"):
            try:
                mapping._extra_content = {}
            except Exception:
                pass

    tok_map = getattr(transformers, "TOKENIZER_MAPPING", None)
    if tok_map is None or not hasattr(tok_map, "_extra_content"):
        return
    registered = {
        cls.__name__
        for value in tok_map._extra_content.values()
        for cls in (value if isinstance(value, tuple) else (value,))
        if cls is not None
    }
    for cls in custom_classes:
        if cls.__name__ not in registered:
            key = type(f"_CM3PCompatKey_{cls.__name__}", (), {})
            tok_map._extra_content[key] = (cls, None)
