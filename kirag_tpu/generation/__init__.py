from kirag_tpu.generation.interface import GenerationOutput, Generator
from kirag_tpu.generation.chat import render_chat, CHAT_FAMILIES
from kirag_tpu.generation.stub import StubBackend, make_stub_generator
from kirag_tpu.generation.answer import AnswerGenerator

__all__ = [
    "GenerationOutput",
    "Generator",
    "render_chat",
    "CHAT_FAMILIES",
    "StubBackend",
    "make_stub_generator",
    "AnswerGenerator",
]
