"""Object-word vocabulary (67 classes) and sentence -> object-word extraction.

The reference uses the YouCook2-BoundingBox 67-class object dictionary
(SURVEY.md L46, L133). The real class list ships with the YouCook2-BB
annotations; since the reference mount is empty, `DEFAULT_CLASSES` below is a
documented stand-in with the right cardinality — load the real list with
`Vocab.from_file` when annotations are available.
"""

from __future__ import annotations

import re

# 67 cooking-object classes (stand-in list; replace via Vocab.from_file when the
# real YouCook2-BB class file is available — cardinality and semantics match).
DEFAULT_CLASSES = [
    "pan", "pot", "bowl", "plate", "knife", "spoon", "fork", "cup", "glass",
    "oven", "stove", "blender", "board", "tray", "lid", "jar", "bottle",
    "oil", "butter", "salt", "pepper", "sugar", "flour", "water", "milk",
    "cream", "cheese", "egg", "chicken", "beef", "pork", "bacon", "sausage",
    "fish", "shrimp", "rice", "pasta", "noodle", "bread", "dough", "tortilla",
    "onion", "garlic", "tomato", "potato", "carrot", "pepper_bell", "mushroom",
    "lettuce", "cabbage", "cucumber", "corn", "bean", "pea", "spinach",
    "broccoli", "lemon", "lime", "apple", "banana", "sauce", "soup", "salad",
    "ginger", "cilantro", "parsley", "seasoning",
]
assert len(DEFAULT_CLASSES) == 67

_TOKEN_RE = re.compile(r"[a-z_]+")


class Vocab:
    """Maps object words <-> class ids; extracts object words from sentences."""

    def __init__(self, classes: list[str] | None = None):
        self.classes = list(classes) if classes is not None else list(DEFAULT_CLASSES)
        self.word_to_id = {w: i for i, w in enumerate(self.classes)}
        # regular English plural aliases: "onions"->"onion", "dishes"->"dish",
        # "berries"->"berry", "tomatoes"->"tomato"
        self._alias = {}
        for w, i in self.word_to_id.items():
            self._alias[w + "s"] = i
            if w.endswith(("s", "sh", "ch", "x", "z", "o")):
                self._alias[w + "es"] = i
            if w.endswith("y") and len(w) > 1 and w[-2] not in "aeiou":
                self._alias[w[:-1] + "ies"] = i

    def __len__(self) -> int:
        return len(self.classes)

    @classmethod
    def from_file(cls, path: str) -> "Vocab":
        # lowercase: lookup() lowercases tokens, so a capitalized class-file
        # entry would otherwise never match anything
        with open(path) as f:
            classes = [ln.strip().lower() for ln in f if ln.strip()]
        return cls(classes)

    def lookup(self, token: str) -> int | None:
        token = token.lower()
        if token in self.word_to_id:
            return self.word_to_id[token]
        return self._alias.get(token)

    def extract(self, sentence: str, max_words: int | None = None,
                dedup: bool = True) -> list[int]:
        """Sentence -> ordered object-word class ids (SURVEY.md L133)."""
        ids, seen = [], set()
        for tok in _TOKEN_RE.findall(sentence.lower()):
            i = self.lookup(tok)
            if i is None or (dedup and i in seen):
                continue
            ids.append(i)
            seen.add(i)
            if max_words is not None and len(ids) >= max_words:
                break
        return ids
