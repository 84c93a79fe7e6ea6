"""Pure-Python reference oracle for eivind-bn/LanguageDetection semantics.

This subpackage reimplements, bug-for-bug, the data-model and operator
semantics of the reference Scala program (see SURVEY.md §1-§2) with NO Spark
dependency. It is the differential-testing oracle for the Spark pipeline.
"""

from .alphabets import LANGUAGES, for_name, may_contain, is_per_char
from .tokenizer import split_words
from .classifier import Vocabulary, classify_language, train_semi_supervised
