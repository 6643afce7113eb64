"""Prompt templating parity tests (reference vis_zephyr/conversation.py)."""

from vis_zephyr_tpu.conversation import templates


def test_zephyr_prompt_format():
    conv = templates["zephyr_v1"].copy()
    conv.append_message("user", "What is in the image?")
    conv.append_message("assistant", "A cat.")
    prompt = conv.get_prompt()
    assert prompt == (
        f"<|system|>\n{conv.system}</s>"
        "<|user|>\nWhat is in the image?</s>"
        "<|assistant|>\nA cat.</s>"
    )


def test_pending_assistant_turn_renders_bare_header():
    conv = templates["zephyr_v1"].copy()
    conv.append_message("user", "Hi")
    conv.append_message("assistant", None)
    assert conv.get_prompt().endswith("<|user|>\nHi</s><|assistant|>\n")


def test_image_tuple_first_message_normalized():
    conv = templates["zephyr_v1"].copy()
    conv.append_message("user", ("<image>\nDescribe this.", "fake_image", "anyres"))
    conv.append_message("assistant", None)
    prompt = conv.get_prompt()
    assert prompt.count("<image>") == 1
    assert "<|user|>\n<image>\nDescribe this.</s>" in prompt


def test_copy_is_deep_for_messages():
    conv = templates["zephyr_vcr"].copy()
    conv.append_message("user", "Q")
    clone = conv.copy()
    clone.append_message("assistant", "A")
    assert len(conv.messages) == 1 and len(clone.messages) == 2


def test_vcr_template_system_prompt_mentions_letter_format():
    assert "Answer is:" in templates["zephyr_vcr"].system
