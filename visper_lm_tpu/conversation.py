"""Conversation prompt templates.

Functional re-design of the reference Conversation dataclass
(/root/reference/ola_vlm/conversation.py). Only the templates actually shipped and
reachable are implemented (vicuna_v1 TWO-style, llava_llama_3 / llava_phi_3 MPT-style,
plain); the LLAMA_2/CHATML branches in the reference are dead code (SURVEY.md §2.5).

Rendered strings must match the reference byte-for-byte: they determine tokenization
and therefore label masks and eval prompts.
"""

from __future__ import annotations

import dataclasses
from enum import Enum, auto
from typing import List, Optional, Tuple


class SeparatorStyle(Enum):
    SINGLE = auto()
    TWO = auto()
    MPT = auto()
    PLAIN = auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"

    def get_prompt(self) -> str:
        messages = self.messages
        if messages and isinstance(messages[0][1], tuple):
            # (message, image, preprocess-mode) tuples from the demo UI: hoist the
            # image tag to the front of the first user turn.
            messages = [list(m) for m in self.messages]
            init_role, init_msg = messages[0]
            init_msg = init_msg[0].replace("<image>", "").strip()
            messages[0] = [init_role, "<image>\n" + init_msg]

        if self.sep_style == SeparatorStyle.SINGLE:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + ": " + message + self.sep
                else:
                    ret += role + ":"
            return ret

        if self.sep_style == SeparatorStyle.TWO:
            seps = [self.sep, self.sep2]
            ret = self.system + seps[0]
            for i, (role, message) in enumerate(messages):
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + ": " + message + seps[i % 2]
                else:
                    ret += role + ":"
            return ret

        if self.sep_style == SeparatorStyle.MPT:
            ret = self.system + self.sep
            for role, message in messages:
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += role + message + self.sep
                else:
                    ret += role
            return ret

        if self.sep_style == SeparatorStyle.PLAIN:
            seps = [self.sep, self.sep2]
            ret = self.system
            for i, (role, message) in enumerate(messages):
                if message:
                    if isinstance(message, tuple):
                        message = message[0]
                    ret += message + seps[i % 2]
                else:
                    ret += ""
            return ret

        raise ValueError(f"Invalid style: {self.sep_style}")

    def append_message(self, role: str, message: Optional[str]) -> None:
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[[r, m] for r, m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
        )


conv_vicuna_v1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    version="v1",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
)

conv_llava_llama_3 = Conversation(
    system=(
        "<|start_header_id|>system<|end_header_id|>\n\nA chat between a curious user and "
        "an artificial intelligence assistant. The assistant gives helpful, detailed, and "
        "polite answers to the user's questions."
    ),
    roles=(
        "<|start_header_id|>user<|end_header_id|>\n\n",
        "<|start_header_id|>assistant<|end_header_id|>\n\n",
    ),
    version="llama3",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.MPT,
    sep="<|eot_id|>",
)

conv_llava_phi_3 = Conversation(
    system="<|system|>\nYou are a helpful AI assistant.",
    roles=("\n<|user|>\n", "\n<|assistant|>\n"),
    version="phi3",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.MPT,
    sep="<|end|>",
)

conv_llava_plain = Conversation(
    system="",
    roles=("", ""),
    version="plain",
    messages=[],
    offset=0,
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
)

default_conversation = conv_llava_phi_3

conv_templates = {
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "llava_phi_3": conv_llava_phi_3,
    "llava_llama_3": conv_llava_llama_3,
    "plain": conv_llava_plain,
}
