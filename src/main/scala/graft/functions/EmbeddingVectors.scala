package graft.functions

/** REAL learned word embeddings: 45 words x 8 dims, trained by the
  * classic count-based distributional pipeline — sentence-windowed
  * (±2) co-occurrence counts over the committed corpus
  * src/test/resources/embedding_corpus.txt (original prose authored
  * for this repo over the documents-table vocabulary), positive PMI,
  * rank-8 symmetric eigen-factorization (fixed-iteration power
  * iteration + deflation, deterministic LCG init, largest-component
  * sign rule), rows scaled by sqrt(lambda) and quantized to integers at
  * scale 1e6. Levy & Goldberg (NeurIPS 2014) showed word2vec SGNS
  * implicitly factorizes exactly this PMI matrix — these are the same
  * object, trained transparently.
  *
  * EmbeddingSpec re-runs the trainer (test-side EmbeddingTrainer, the
  * BpeSpec/ClassifierSpec discipline) and asserts it reproduces this
  * table EXACTLY. Integer quantization makes every downstream use
  * (document embedding sums, cosine numerators/denominators)
  * SQL-replayable as a literal VALUES join: the whole chain stays in
  * exact integer/decimal arithmetic until one final double division.
  *
  * Semantic sanity (cosine on these rows): group~agg 0.80, join~key
  * 0.59, join~hash 0.51, scan~filter 0.34 — against cross-topic pairs
  * window~hash -0.08, filter~merge -0.13. The structure is learned
  * from co-occurrence, not planted.
  */
object EmbeddingVectors {
  val Dim = 8
  val Scale = 1000000L

  val Vectors: Seq[(String, Seq[Long])] = Seq(
    ("a", Seq(801528L, -322899L, 216884L, -27609L, -409802L, 215253L, -278297L, 100090L)),
    ("agg", Seq(312292L, 46115L, 591682L, 263194L, 246135L, -289155L, -246750L, 171672L)),
    ("and", Seq(348448L, 36961L, -148541L, 237838L, 191274L, -317361L, 78966L, 52958L)),
    ("batch", Seq(509070L, -129793L, -322534L, 318399L, -330449L, -535842L, 294849L, 523237L)),
    ("big", Seq(406253L, 620571L, 53657L, -208728L, -384453L, -414133L, 220941L, -289728L)),
    ("by", Seq(410574L, -141818L, -81474L, 917227L, -110953L, 533262L, 85548L, 120362L)),
    ("column", Seq(518330L, -257033L, 560135L, -217459L, 3168L, -75556L, -84025L, -120950L)),
    ("customer", Seq(537966L, 218783L, -589312L, -257963L, 820969L, -54541L, -280789L, -7119L)),
    ("data", Seq(359372L, 10507L, 113777L, 328119L, -150691L, 576400L, 14974L, -270020L)),
    ("dup", Seq(752345L, -733278L, -409571L, -578171L, 193410L, 66682L, 155801L, 43564L)),
    ("each", Seq(716198L, -267714L, -50448L, 44509L, 484924L, -56795L, 287692L, -29451L)),
    ("fast", Seq(617252L, 784313L, 44524L, -306733L, -165341L, 674276L, 176677L, 100383L)),
    ("filter", Seq(301031L, -198493L, 375025L, 148350L, 26599L, -227194L, -130391L, 387579L)),
    ("group", Seq(409266L, 42049L, 387875L, 391145L, 17748L, -116707L, -197595L, -174113L)),
    ("hash", Seq(262350L, 39537L, -24232L, 612512L, -68962L, 506015L, 22504L, -358082L)),
    ("in", Seq(701875L, -862096L, -28596L, -367194L, -249043L, 205227L, -260844L, -294307L)),
    ("is", Seq(703651L, 985640L, -45777L, -322363L, -448148L, -110051L, -161773L, 185418L)),
    ("join", Seq(492960L, 373684L, -28478L, 213150L, 137693L, 700655L, -146605L, 360565L)),
    ("key", Seq(525906L, -81538L, -274851L, 238978L, 416820L, 243474L, -171334L, -82177L)),
    ("line", Seq(631585L, 185672L, -806080L, -149552L, 549242L, -360990L, -324297L, 54995L)),
    ("merge", Seq(274500L, 109147L, -121123L, 176793L, 424239L, 163503L, 59946L, -162952L)),
    ("of", Seq(466977L, 36497L, -192579L, 410640L, -159846L, -172753L, 251536L, 163306L)),
    ("on", Seq(477188L, 27279L, -415552L, 516197L, -117503L, -23050L, -111883L, -116824L)),
    ("order", Seq(517809L, -311667L, -411020L, 715044L, -393470L, -88165L, 123360L, 78428L)),
    ("part", Seq(569194L, -255611L, -166999L, -206870L, -299351L, -164004L, 80301L, -394979L)),
    ("plan", Seq(509269L, 780217L, 127908L, -222295L, -616311L, 11087L, -98674L, 72406L)),
    ("query", Seq(267161L, -19344L, 670470L, 232611L, 508368L, -305225L, -93238L, -156445L)),
    ("reads", Seq(542792L, 105076L, 592150L, -139373L, 205044L, -31966L, 421941L, -213537L)),
    ("row", Seq(719397L, -765483L, -64668L, -583145L, -109930L, 51191L, 251487L, 55300L)),
    ("rows", Seq(367781L, -29568L, -527595L, 412840L, 175411L, -497287L, 100961L, 1308L)),
    ("scan", Seq(607701L, 201793L, 329438L, -261352L, 70876L, 427273L, 168142L, 314890L)),
    ("side", Seq(367747L, 344581L, -375871L, -70616L, 200575L, -530016L, -204946L, -285649L)),
    ("slow", Seq(598634L, 620761L, 553273L, -209772L, 158797L, 125837L, -7579L, 105413L)),
    ("small", Seq(528459L, 493099L, -308132L, -65830L, -669071L, -518525L, 34161L, -216549L)),
    ("so", Seq(505597L, -103566L, 1233832L, 252594L, 164417L, -486518L, -122569L, 33110L)),
    ("sort", Seq(335822L, -118830L, -215841L, 728103L, -377726L, 227592L, -259175L, -250617L)),
    ("spark", Seq(337638L, -49229L, 300237L, 180205L, 542599L, -224171L, 416765L, -302396L)),
    ("stream", Seq(295989L, -159750L, 8775L, 230992L, -193467L, 190907L, -51552L, -183754L)),
    ("table", Seq(444569L, 557582L, 43554L, -96644L, -339642L, -259077L, 31311L, -245869L)),
    ("the", Seq(502410L, 15659L, 239327L, 554504L, 253607L, -58081L, 132969L, -2740L)),
    ("to", Seq(706013L, 680793L, -275089L, -271858L, 714644L, 419983L, 22619L, -15209L)),
    ("value", Seq(657356L, -814144L, 6335L, -645917L, -300872L, 179045L, -32348L, -155008L)),
    ("vector", Seq(395960L, -386480L, 531272L, -52306L, -146859L, -26007L, -311375L, 84749L)),
    ("when", Seq(592212L, -543302L, -200293L, -60027L, -41784L, -133662L, -75950L, 461968L)),
    ("window", Seq(314675L, -103949L, 11331L, 153101L, -117933L, -238827L, 149036L, 282864L)))
}
