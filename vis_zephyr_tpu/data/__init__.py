"""Host-side data preparation: anyres geometry, tokenization, image pipeline,
visual prompting, datasets and collators."""
