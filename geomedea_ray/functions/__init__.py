"""Pure, vectorized (numpy) functions — no Ray imports here."""
