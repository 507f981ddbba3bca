package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trigram-profile language identification [public technique: Cavnar &
  * Trenkle 1994 "N-Gram-Based Text Categorization" — the same
  * rank-profile method behind classic langid tools; reference anchor:
  * OCRmyPDF's per-language model selection surface,
  * `src/ocrmypdf/languages.py` / Tesseract's ~100 per-language models].
  *
  * Model: per language, the `topK` most frequent character trigrams of
  * its training text, ranked by (count DESC, trigram ASC). A document is
  * classified by the out-of-place distance between its own trigram rank
  * profile and each language profile: matched trigram → |doc rank −
  * profile rank|, unmatched → the max penalty `topK`; predicted language
  * = argmin distance with lexicographic tie-break — every step integer
  * and deterministic, so a SQL oracle replays it bit-for-bit.
  *
  * 100 TB shape: the profile table is the model — ≤ langs·topK rows,
  * broadcast. The corpus side is a narrow trigram explode feeding two
  * compact-key shuffles (per-doc gram counts, then a per-doc top-K
  * window — bounded partitions). No per-doc × language grid exists at
  * all: matched pairs come from the broadcast profile join alone, and
  * because every matched gram strictly lowers a language's out-of-place
  * distance below the all-unmatched topK·g, the argmin over ALL
  * languages equals the argmin over the matched rows — absent languages
  * are never materialized. Text never moves through a join.
  *
  * Training data: [[seed]] — a deterministic in-code multilingual
  * fixture (32 languages × 6 sentences; 4 train + 2 held-out test per
  * language), the sandbox stand-in for profiles trained on a labeled
  * corpus slice. `trainProfiles(docs, labelCol, textCol)` fits the same
  * model from any labeled table.
  */
object LangId {

  /** Sentences per language reserved for training; the rest are the
    * held-out classification fixtures. */
  val trainPerLang = 4

  /** Profile length (grams per language) and the unmatched penalty. */
  val topK = 120

  /** (ISO 639-3 code, 6 sentences: 4 train + 2 test). All text is
    * BMP-only (Spark substring and DuckDB substr both count codepoints,
    * but surrogate-pair handling is the one place they could drift). */
  val seed: Seq[(String, Seq[String])] = Seq(
    "ara" -> Seq(
      "يقرأ النظام كل وثيقة ويستخرج النص الرئيسي",
      "نعالج البيانات كل يوم في خط الأنابيب",
      "يكتب المحرك النتائج في الجدول",
      "المرشح الجيد يحفظ المحتوى ويزيل الضوضاء",
      "يستخرج خط الأنابيب النص من كل وثيقة",
      "نكتب النتائج في الجدول"),
    "bul" -> Seq(
      "системата чете всеки документ и извлича основния текст",
      "обработваме данните всеки ден в тръбопровода",
      "двигателят записва резултатите в таблицата",
      "добър филтър запазва съдържанието и премахва шума",
      "тръбопроводът извлича текста от всеки документ",
      "записваме резултатите в таблицата"),
    "ces" -> Seq(
      "systém čte každý dokument a vytahuje hlavní text",
      "zpracováváme data každý den v potrubí",
      "motor zapisuje výsledky do tabulky",
      "dobrý filtr zachovává obsah a odstraňuje šum",
      "potrubí vytahuje text z každého dokumentu",
      "čteme a zapisujeme výsledky do tabulky každý den"),
    "dan" -> Seq(
      "systemet læser hvert dokument og udtrækker hovedteksten",
      "vi behandler data hver dag i rørledningen",
      "motoren skriver resultaterne til tabellen",
      "et godt filter beholder indholdet og fjerner støjen",
      "rørledningen udtrækker hovedteksten fra hvert dokument",
      "motoren udtrækker teksten og skriver resultaterne til tabellen"),
    "deu" -> Seq(
      "das system liest jedes dokument und extrahiert den haupttext",
      "wir verarbeiten die daten jeden tag in der pipeline",
      "die maschine schreibt die ergebnisse in die tabelle",
      "ein guter filter behält den inhalt und entfernt das rauschen",
      "die pipeline extrahiert den text aus jedem dokument",
      "wir schreiben die ergebnisse jeden tag in die tabelle"),
    "ell" -> Seq(
      "το σύστημα διαβάζει κάθε έγγραφο και εξάγει το κύριο κείμενο",
      "επεξεργαζόμαστε τα δεδομένα κάθε μέρα στον αγωγό",
      "η μηχανή γράφει τα αποτελέσματα στον πίνακα",
      "ένα καλό φίλτρο κρατά το περιεχόμενο και αφαιρεί τον θόρυβο",
      "ο αγωγός εξάγει το κείμενο από κάθε έγγραφο",
      "γράφουμε τα αποτελέσματα στον πίνακα"),
    "eng" -> Seq(
      "the system reads every document and extracts the main text",
      "we process data in the pipeline every day",
      "the engine writes the results to the table",
      "a good filter keeps the content and drops the noise",
      "the pipeline extracts text from every document",
      "we write the results to the data table"),
    "est" -> Seq(
      "süsteem loeb iga dokumendi ja võtab välja põhiteksti",
      "töötleme andmeid iga päev torustikus",
      "mootor kirjutab tulemused tabelisse",
      "hea filter hoiab sisu ja eemaldab müra",
      "torustik võtab teksti välja igast dokumendist",
      "kirjutame tulemused iga päev tabelisse"),
    "fas" -> Seq(
      "سیستم هر سند را می خواند و متن اصلی را استخراج می کند",
      "ما داده ها را هر روز در خط لوله پردازش می کنیم",
      "موتور نتایج را در جدول می نویسد",
      "یک فیلتر خوب محتوا را نگه می دارد و نویز را حذف می کند",
      "خط لوله متن را از هر سند استخراج می کند",
      "ما نتایج را در جدول می نویسیم"),
    "fin" -> Seq(
      "järjestelmä lukee jokaisen asiakirjan ja poimii päätekstin",
      "käsittelemme tietoja joka päivä putkessa",
      "moottori kirjoittaa tulokset tauluun",
      "hyvä suodatin säilyttää sisällön ja poistaa kohinan",
      "putki poimii tekstin jokaisesta asiakirjasta",
      "kirjoitamme tulokset joka päivä tauluun"),
    "fra" -> Seq(
      "le système lit chaque document et extrait le texte principal",
      "nous traitons les données chaque jour dans le pipeline",
      "le moteur écrit les résultats dans la table",
      "un bon filtre garde le contenu et supprime le bruit",
      "le pipeline extrait le texte de chaque document",
      "nous écrivons les résultats dans la table"),
    "heb" -> Seq(
      "המערכת קוראת כל מסמך ומחלצת את הטקסט הראשי",
      "אנחנו מעבדים את הנתונים כל יום בצינור",
      "המנוע כותב את התוצאות לטבלה",
      "מסנן טוב שומר על התוכן ומסיר את הרעש",
      "הצינור מחלץ את הטקסט מכל מסמך",
      "אנחנו כותבים את התוצאות לטבלה"),
    "hin" -> Seq(
      "प्रणाली हर दस्तावेज़ पढ़ती है और मुख्य पाठ निकालती है",
      "हम हर दिन पाइपलाइन में डेटा संसाधित करते हैं",
      "इंजन परिणाम तालिका में लिखता है",
      "अच्छा फ़िल्टर सामग्री रखता है और शोर हटाता है",
      "पाइपलाइन हर दस्तावेज़ से पाठ निकालती है",
      "हम परिणाम तालिका में लिखते हैं"),
    "hun" -> Seq(
      "a rendszer minden dokumentumot elolvas és kinyeri a fő szöveget",
      "minden nap feldolgozzuk az adatokat a csővezetékben",
      "a motor az eredményeket a táblába írja",
      "egy jó szűrő megtartja a tartalmat és eltávolítja a zajt",
      "a csővezeték kinyeri a szöveget minden dokumentumból",
      "az eredményeket minden nap a táblába írjuk"),
    "ind" -> Seq(
      "sistem membaca setiap dokumen dan mengekstrak teks utama",
      "kami memproses data setiap hari dalam saluran pipa",
      "mesin menulis hasil ke dalam tabel",
      "filter yang baik menyimpan konten dan menghapus derau",
      "saluran pipa mengekstrak teks dari setiap dokumen",
      "kami menulis hasil ke dalam tabel setiap hari"),
    "ita" -> Seq(
      "il sistema legge ogni documento ed estrae il testo principale",
      "elaboriamo i dati ogni giorno nella pipeline",
      "il motore scrive i risultati nella tabella",
      "un buon filtro mantiene il contenuto ed elimina il rumore",
      "la pipeline estrae il testo da ogni documento",
      "scriviamo i risultati nella tabella ogni giorno"),
    "jpn" -> Seq(
      "システムはすべての文書を読み取り主要なテキストを抽出する",
      "私たちは毎日パイプラインでデータを処理する",
      "エンジンは結果をテーブルに書き込む",
      "良いフィルタは内容を保持し雑音を取り除く",
      "パイプラインはすべての文書からテキストを抽出する",
      "私たちは結果をテーブルに書き込む"),
    "kor" -> Seq(
      "시스템은 모든 문서를 읽고 주요 텍스트를 추출한다",
      "우리는 매일 파이프라인에서 데이터를 처리한다",
      "엔진은 결과를 테이블에 기록한다",
      "좋은 필터는 내용을 유지하고 소음을 제거한다",
      "파이프라인은 모든 문서에서 텍스트를 추출한다",
      "우리는 결과를 테이블에 기록한다"),
    "nld" -> Seq(
      "het systeem leest elk document en haalt de hoofdtekst eruit",
      "wij verwerken de gegevens elke dag in de pijplijn",
      "de machine schrijft de resultaten naar de tabel",
      "een goed filter houdt de inhoud en verwijdert de ruis",
      "de pijplijn haalt de tekst uit elk document",
      "wij schrijven de resultaten elke dag naar de tabel"),
    "nor" -> Seq(
      "systemet leser hvert dokument og trekker ut hovedteksten",
      "vi behandler dataene hver dag i rørledningen",
      "motoren skriver resultatene til tabellen",
      "et godt filter beholder innholdet og fjerner støyen",
      "rørledningen trekker ut hovedteksten fra hvert dokument",
      "motoren trekker ut teksten og skriver resultatene til tabellen"),
    "pol" -> Seq(
      "system czyta każdy dokument i wydobywa główny tekst",
      "przetwarzamy dane codziennie w potoku",
      "silnik zapisuje wyniki do tabeli",
      "dobry filtr zachowuje treść i usuwa szum",
      "potok wydobywa tekst z każdego dokumentu",
      "zapisujemy wyniki do tabeli codziennie"),
    "por" -> Seq(
      "o sistema lê cada documento e extrai o texto principal",
      "processamos os dados todos os dias no pipeline",
      "o motor escreve os resultados na tabela",
      "um bom filtro guarda o conteúdo e remove o ruído",
      "o pipeline extrai o texto de cada documento",
      "escrevemos os resultados na tabela todos os dias"),
    "ron" -> Seq(
      "sistemul citește fiecare document și extrage textul principal",
      "procesăm datele în fiecare zi în conductă",
      "motorul scrie rezultatele în tabel",
      "un filtru bun păstrează conținutul și elimină zgomotul",
      "conducta extrage textul din fiecare document",
      "scriem rezultatele în tabel în fiecare zi"),
    "rus" -> Seq(
      "система читает каждый документ и извлекает основной текст",
      "мы обрабатываем данные каждый день в конвейере",
      "движок записывает результаты в таблицу",
      "хороший фильтр сохраняет содержимое и убирает шум",
      "конвейер извлекает текст из каждого документа",
      "мы записываем результаты в таблицу"),
    "slk" -> Seq(
      "systém číta každý dokument a vyťahuje hlavný text",
      "spracovávame údaje každý deň v potrubí",
      "motor zapisuje výsledky do tabuľky",
      "dobrý filter zachováva obsah a odstraňuje šum",
      "potrubie vyťahuje hlavný text a spracovávame údaje z každého dokumentu",
      "čítame a zapisujeme výsledky do tabuľky každý deň"),
    "spa" -> Seq(
      "el sistema lee cada documento y extrae el texto principal",
      "procesamos los datos cada día en la tubería",
      "el motor escribe los resultados en la tabla",
      "un buen filtro guarda el contenido y elimina el ruido",
      "la tubería extrae el texto de cada documento",
      "escribimos los resultados en la tabla cada día"),
    "swe" -> Seq(
      "systemet läser varje dokument och extraherar huvudtexten",
      "vi behandlar data varje dag i pipelinen",
      "motorn skriver resultaten till tabellen",
      "ett bra filter behåller innehållet och tar bort bruset",
      "pipelinen extraherar texten från varje dokument",
      "vi skriver resultaten till tabellen varje dag"),
    "tha" -> Seq(
      "ระบบอ่านเอกสารทุกฉบับและดึงข้อความหลักออกมา",
      "เราประมวลผลข้อมูลทุกวันในท่อส่ง",
      "เครื่องยนต์เขียนผลลัพธ์ลงในตาราง",
      "ตัวกรองที่ดีเก็บเนื้อหาและลบเสียงรบกวน",
      "ท่อส่งดึงข้อความจากเอกสารทุกฉบับ",
      "เราเขียนผลลัพธ์ลงในตาราง"),
    "tur" -> Seq(
      "sistem her belgeyi okur ve ana metni çıkarır",
      "verileri her gün boru hattında işleriz",
      "motor sonuçları tabloya yazar",
      "iyi bir filtre içeriği korur ve gürültüyü kaldırır",
      "boru hattı her belgeden metni çıkarır",
      "sonuçları her gün tabloya yazarız"),
    "ukr" -> Seq(
      "система читає кожен документ і витягує основний текст",
      "ми обробляємо дані щодня в конвеєрі",
      "двигун записує результати в таблицю",
      "хороший фільтр зберігає вміст і прибирає шум",
      "конвеєр витягує текст з кожного документа",
      "ми записуємо результати в таблицю щодня"),
    "vie" -> Seq(
      "hệ thống đọc mọi tài liệu và trích xuất văn bản chính",
      "chúng tôi xử lý dữ liệu mỗi ngày trong đường ống",
      "động cơ ghi kết quả vào bảng",
      "bộ lọc tốt giữ nội dung và loại bỏ tiếng ồn",
      "đường ống trích xuất văn bản từ mọi tài liệu",
      "chúng tôi ghi kết quả vào bảng mỗi ngày"),
    "zho" -> Seq(
      "系统读取每个文档并提取主要文本",
      "我们每天在管道中处理数据",
      "引擎将结果写入表格",
      "好的过滤器保留内容并去除噪声",
      "管道从每个文档中提取文本",
      "我们将结果写入表格"))

  /** One (lang, text) training row per language: the train sentences
    * joined with a single space. */
  def trainRows: Seq[(String, String)] =
    seed.map { case (l, ss) => (l, ss.take(trainPerLang).mkString(" ")) }

  /** Held-out fixtures: (sample_id, true_lang, text). */
  def testRows: Seq[(String, String, String)] =
    seed.flatMap { case (l, ss) =>
      ss.drop(trainPerLang).zipWithIndex.map { case (t, i) =>
        (s"$l/$i", l, t)
      }
    }

  def trainDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    trainRows.toDF("lang", "text")
  }

  def testDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    testRows.toDF("sample_id", "true_lang", "text")
  }

  /** Character trigrams of `c` at every position (1-based, codepoints) —
    * the same idiom as CorpusStats.trigramQuality's model grams. */
  private def triExpr(c: String): org.apache.spark.sql.Column =
    expr(s"case when length($c) >= 3 then " +
      s"transform(sequence(1, length($c) - 2), i -> substring($c, i, 3)) " +
      "else array() end")

  /** Fit per-language rank profiles from any labeled table:
    * (lang, gram, prank), prank 1..topK by (count DESC, gram ASC). */
  def trainProfiles(labeled: DataFrame, labelCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n").desc, col("gram").asc)
    labeled
      .select(col(labelCol).as("lang"), explode(triExpr(textCol)).as("gram"))
      .groupBy("lang", "gram").agg(count(lit(1)).as("n"))
      .withColumn("prank", row_number().over(w))
      .filter(col("prank") <= topK)
      .select("lang", "gram", "prank")
  }

  /** Classify `docs` rows against `profiles` (from [[trainProfiles]]):
    * → (idCol, pred_lang, dist). Rows shorter than 3 codepoints carry
    * no trigram evidence and classify as 'und' with dist 0. */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame): DataFrame = {
    val wDoc = Window.partitionBy("sid").orderBy(col("n").desc, col("gram").asc)
    // dr feeds BOTH the per-doc gram count and the profile join: persist
    // is the barrier that stops Catalyst re-inlining the trigram explode
    // into each consumer (the corpus-scan subtree would run twice). The
    // barrier must outlive the returned LAZY DataFrame, so it cannot be
    // unpersisted here — same contract as the substring-dedup gram
    // tables: MEMORY_AND_DISK degrades by LRU eviction, and a session
    // classifying many corpora should spark.catalog.clearCache()
    // between them
    val dr = docs
      .select(col(idCol).as("sid"), explode(triExpr(textCol)).as("gram"))
      .groupBy("sid", "gram").agg(count(lit(1)).as("n"))
      .withColumn("drank", row_number().over(wDoc))
      .filter(col("drank") <= topK)
      .select("sid", "gram", "drank")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gCount = dr.groupBy("sid").agg(count(lit(1)).as("g"))
    // matched mass from the broadcast profile join. No per-doc × language
    // grid is ever materialized: dist(lang) = topK·g − bonus(lang) with
    // bonus = topK·mcnt − mdist, and bonus ≥ 1 for every matched gram
    // (|drank − prank| ≤ topK − 1), so a language absent from `matched`
    // (bonus 0, dist topK·g) can never beat a matched one — the argmin
    // over all languages equals the argmin over the matched rows alone.
    // topK·g is a per-doc constant, so ordering by (mdist − topK·mcnt,
    // lang) reproduces the (dist, lang) tie-break exactly.
    val matched = dr.join(broadcast(profiles), Seq("gram"))
      .groupBy("sid", "lang")
      .agg(sum(abs(col("drank") - col("prank"))).as("mdist"),
        count(lit(1)).as("mcnt"))
    val best = matched
      .select(col("sid"),
        (col("mdist") - lit(topK.toLong) * col("mcnt")).as("negbonus"),
        col("lang"))
      .groupBy("sid")
      .agg(min(struct(col("negbonus"), col("lang"))).as("m"))
      .select(col("sid"), col("m.lang").as("match_lang"),
        col("m.negbonus").as("negbonus"))
    // a doc whose grams match NO profile ties all languages at topK·g;
    // the (dist, lang) argmin then degenerates to the alphabetically
    // first language — a one-value model pull, same as the collected
    // centroid models in Similarity
    val fallbackLang = profiles.agg(min(col("lang"))).head.getString(0)
    val pred = gCount.join(best, Seq("sid"), "left")
      .select(col("sid"),
        coalesce(col("match_lang"), lit(fallbackLang)).as("pred_lang"),
        (lit(topK.toLong) * col("g") + coalesce(col("negbonus"), lit(0L)))
          .as("dist"))
    docs.select(col(idCol).as("sid"))
      .join(pred, Seq("sid"), "left")
      .select(col("sid").as(idCol),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("dist"), lit(0L)).as("dist"))
  }

  /** SQL literal escaping for the oracle VALUES lists. */
  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The train VALUES CTE body, shared with the DuckDB oracle so both
    * engines see one source of truth. */
  def trainValuesSql: String =
    trainRows.map { case (l, t) => s"(${q(l)}, ${q(t)})" }.mkString(",\n  ")

  def testValuesSql: String =
    testRows.map { case (id, l, t) => s"(${q(id)}, ${q(l)}, ${q(t)})" }
      .mkString(",\n  ")
}
