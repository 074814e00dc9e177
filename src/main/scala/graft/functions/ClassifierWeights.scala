package graft.functions

/** REAL learned weights for the linear text-quality classifier: an
  * all-integer perceptron (20 fixed epochs, per-occurrence updates on
  * misclassified margin, examples in file order) trained over the
  * committed labeled corpus src/test/resources/classifier_corpus.tsv
  * (15 clean-prose positives, 15 junk negatives — authored for this
  * repo). ClassifierSpec re-runs the trainer and asserts it reproduces
  * this table EXACTLY; integer arithmetic makes training and scoring
  * bit-deterministic and the scoring chain SQL-replayable as a literal
  * VALUES join. Zero-weight tokens are dropped (absent == weight 0 at
  * scoring time either way). Training accuracy on the corpus: 30/30.
  */
object ClassifierWeights {
  val Weights: Seq[(String, Long)] = Seq(
    ("!!!!", -1L), ("####", -1L), ("$$$$", -1L), ("%%%%", -1L),
    ("&&&&", -1L), ("((((", -1L), ("))))", -1L), ("****", -1L),
    ("0000", -2L), ("1111", -2L), ("2222", -1L), ("3333", -1L),
    ("4444", -1L), ("5555", -1L), ("6666", -1L), ("7777", -1L),
    ("8888", -1L), ("9999", -1L), ("::::", -1L), (";;;;", -1L),
    ("????", -1L), ("^^^^", -1L), ("a", 1L), ("aaaaaaaa", -1L),
    ("and", 1L), ("asdf", -7L), ("assembled", 1L), ("bbbb", -1L),
    ("bbbbbbbb", -1L), ("be", 1L), ("before", 1L), ("begins.", 1L),
    ("brb", -4L), ("buy", -3L), ("can", 1L), ("carries", 1L),
    ("cccccccc", -1L), ("cheap", -3L), ("cheaply.", 1L), ("claim", -2L),
    ("clear", 1L), ("click", -3L), ("complete", 1L), ("dddddddd", -1L),
    ("documents", 1L), ("eeeeeeee", -1L), ("events", 1L), ("ffffffff", -1L),
    ("filters", 1L), ("follow", -3L), ("free", -3L), ("functions", 1L),
    ("gggggggg", -1L), ("good", 1L), ("haha", -3L), ("hehe", -3L),
    ("here", -3L), ("hhhhhhhh", -1L), ("hoho", -3L), ("how", 1L),
    ("http://spam.example", -4L), ("in", 1L), ("jjjj", -1L), ("jkl", -7L),
    ("kkkk", -1L), ("like", -3L), ("lol", -4L), ("mmmm", -1L),
    ("money", -3L), ("nnnn", -1L), ("now", -3L), ("omg", -4L),
    ("order", 1L), ("paragraph", 1L), ("pipeline", 1L), ("prize", -3L),
    ("qqqq", -2L), ("qwerty", -6L), ("rank", 1L), ("report", 1L),
    ("sentences", 1L), ("sessions", 1L), ("share", -3L), ("so", 1L),
    ("spam", -13L), ("structure.", 1L), ("subscribe", -3L), ("summarizes", 1L),
    ("the", 2L), ("time", 1L), ("training", 1L), ("uiop", -6L),
    ("varied", 1L), ("vocabulary", 1L), ("vvvv", -1L), ("win", -3L),
    ("window", 1L), ("with", 1L), ("wtf", -4L), ("wwww", -2L),
    ("xoxo", -3L), ("xxxx", -2L), ("zzzz", -2L))
}
