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
  * fixture (100 languages × 6 sentences; 4 train + 2 held-out test per
  * language — the breadth analog of the reference's ~100 per-language
  * model inventory in `languages.py`), the sandbox stand-in for
  * profiles trained on a labeled corpus slice.
  * `trainProfiles(docs, labelCol, textCol)` fits the same model from
  * any labeled table.
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
    "afr" -> Seq(
      "die stelsel lees elke dokument en onttrek die hoofteks",
      "ons verwerk die data elke dag in die pyplyn",
      "die enjin skryf die resultate na die tabel",
      "n goeie filter hou die inhoud en verwyder die geraas",
      "die pyplyn onttrek die hoofteks uit elke dokument",
      "ons skryf die resultate elke dag na die tabel"),
    "amh" -> Seq(
      "ስርዓቱ እያንዳንዱን ሰነድ ያነባል እና ዋናውን ጽሑፍ ያወጣል",
      "መረጃውን በየቀኑ በቧንቧ መስመር እናካሂዳለን",
      "ሞተሩ ውጤቶቹን በሰንጠረዡ ውስጥ ይጽፋል",
      "ጥሩ ማጣሪያ ይዘቱን ይይዛል እና ጫጫታውን ያስወግዳል",
      "ቧንቧ መስመሩ ከእያንዳንዱ ሰነድ ጽሑፉን ያወጣል",
      "ውጤቶቹን በሰንጠረዡ ውስጥ እንጽፋለን"),
    "ara" -> Seq(
      "يقرأ النظام كل وثيقة ويستخرج النص الرئيسي",
      "نعالج البيانات كل يوم في خط الأنابيب",
      "يكتب المحرك النتائج في الجدول",
      "المرشح الجيد يحفظ المحتوى ويزيل الضوضاء",
      "يستخرج خط الأنابيب النص من كل وثيقة",
      "نكتب النتائج في الجدول"),
    "asm" -> Seq(
      "চিস্টেমে প্ৰতিখন নথি পঢ়ে আৰু মূল পাঠ উলিয়াই আনে",
      "আমি প্ৰতিদিনে পাইপলাইনত তথ্য প্ৰক্ৰিয়া কৰোঁ",
      "ইঞ্জিনে ফলাফলবোৰ তালিকাত লিখে",
      "ভাল ফিল্টাৰে বিষয়বস্তু ৰাখে আৰু কোলাহল আঁতৰায়",
      "পাইপলাইনে প্ৰতিখন নথিৰ পৰা পাঠ উলিয়াই আনে",
      "আমি ফলাফলবোৰ তালিকাত লিখোঁ"),
    "aze" -> Seq(
      "sistem hər sənədi oxuyur və əsas mətni çıxarır",
      "biz məlumatları hər gün boru xəttində emal edirik",
      "mühərrik nəticələri cədvələ yazır",
      "yaxşı filtr məzmunu saxlayır və səs küyünü aradan qaldırır",
      "boru xətti hər sənəddən mətni çıxarır",
      "biz nəticələri cədvələ yazırıq"),
    "bel" -> Seq(
      "сістэма чытае кожны дакумент і вымае асноўны тэкст",
      "мы апрацоўваем дадзеныя кожны дзень у канвееры",
      "рухавік запісвае вынікі ў табліцу",
      "добры фільтр захоўвае змесціва і прыбірае шум",
      "канвеер вымае тэкст з кожнага дакумента",
      "мы запісваем вынікі ў табліцу"),
    "ben" -> Seq(
      "সিস্টেম প্রতিটি নথি পড়ে এবং প্রধান পাঠ্য বের করে",
      "আমরা প্রতিদিন পাইপলাইনে ডেটা প্রক্রিয়া করি",
      "ইঞ্জিন ফলাফল টেবিলে লেখে",
      "ভাল ফিল্টার বিষয়বস্তু রাখে এবং শব্দ সরিয়ে দেয়",
      "পাইপলাইন প্রতিটি নথি থেকে পাঠ্য বের করে",
      "আমরা ফলাফল টেবিলে লিখি"),
    "bod" -> Seq(
      "མ་ལག་གིས་ཡིག་ཆ་རེ་རེ་ཀློག་ནས་མ་ཡིག་གཙོ་བོ་འདོན་གྱི་ཡོད",
      "ང་ཚོས་ཉིན་རེར་གཞི་གྲངས་རྣམས་རྒྱུད་ལམ་ནང་ལས་སྣོན་བྱེད་ཀྱི་ཡོད",
      "འཕྲུལ་འཁོར་གྱིས་གྲུབ་འབྲས་རྣམས་རེའུ་མིག་ནང་འབྲི་གི་ཡོད",
      "ཚགས་མ་བཟང་པོས་ནང་དོན་ཉར་ཞིང་སྐད་ཅོར་སེལ་གྱི་ཡོད",
      "རྒྱུད་ལམ་གྱིས་ཡིག་ཆ་རེ་རེ་ནས་ཡི་གེ་འདོན་གྱི་ཡོད",
      "ང་ཚོས་གྲུབ་འབྲས་རྣམས་རེའུ་མིག་ནང་འབྲི་གི་ཡོད"),
    "bos" -> Seq(
      "sistem čita svaki dokument i izdvaja osnovni tekst",
      "podatke obrađujemo svakodnevno u protočnoj liniji",
      "mašina upisuje rezultate u tabelu",
      "dobar filter čuva sadržaj i otklanja šum",
      "protočna linija izdvaja tekst iz svakog dokumenta",
      "mi upisujemo rezultate u tabelu svakodnevno"),
    "bul" -> Seq(
      "системата чете всеки документ и извлича основния текст",
      "обработваме данните всеки ден в тръбопровода",
      "двигателят записва резултатите в таблицата",
      "добър филтър запазва съдържанието и премахва шума",
      "тръбопроводът извлича текста от всеки документ",
      "записваме резултатите в таблицата"),
    "cat" -> Seq(
      "el sistema llegeix cada document i extreu el text principal",
      "processem les dades cada dia al conducte",
      "el motor escriu els resultats a la taula",
      "un bon filtre guarda el contingut i elimina el soroll",
      "el conducte extreu el text de cada document",
      "escrivim els resultats a la taula cada dia"),
    "ceb" -> Seq(
      "ang sistema nagbasa sa matag dokumento ug nagkuha sa panguna nga teksto",
      "giproseso namo ang datos matag adlaw sa tubo",
      "ang makina nagsulat sa mga resulta ngadto sa lamesa",
      "ang maayong filter nagtipig sa sulod ug nagwagtang sa saba",
      "ang tubo nagkuha sa teksto gikan sa matag dokumento",
      "gisulat namo ang mga resulta ngadto sa lamesa"),
    "ces" -> Seq(
      "systém čte každý dokument a vytahuje hlavní text",
      "zpracováváme data každý den v potrubí",
      "motor zapisuje výsledky do tabulky",
      "dobrý filtr zachovává obsah a odstraňuje šum",
      "potrubí vytahuje text z každého dokumentu",
      "čteme a zapisujeme výsledky do tabulky každý den"),
    "cym" -> Seq(
      "mae'r system yn darllen pob dogfen ac yn echdynnu'r prif destun",
      "rydym yn prosesu'r data bob dydd yn y biblinell",
      "mae'r peiriant yn ysgrifennu'r canlyniadau i'r tabl",
      "mae hidlydd da yn cadw'r cynnwys ac yn dileu'r sŵn",
      "mae'r biblinell yn echdynnu'r testun o bob dogfen",
      "rydym yn ysgrifennu'r canlyniadau i'r tabl bob dydd"),
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
    "epo" -> Seq(
      "la sistemo legas ĉiun dokumenton kaj eltiras la ĉefan tekston",
      "ni prilaboras la datumojn ĉiutage en la dukto",
      "la motoro skribas la rezultojn en la tabelon",
      "bona filtrilo konservas la enhavon kaj forigas la bruon",
      "la dukto eltiras la tekston el ĉiu dokumento",
      "ni skribas la rezultojn en la tabelon ĉiutage"),
    "est" -> Seq(
      "süsteem loeb iga dokumendi ja võtab välja põhiteksti",
      "töötleme andmeid iga päev torustikus",
      "mootor kirjutab tulemused tabelisse",
      "hea filter hoiab sisu ja eemaldab müra",
      "torustik võtab teksti välja igast dokumendist",
      "kirjutame tulemused iga päev tabelisse"),
    "eus" -> Seq(
      "sistemak dokumentu bakoitza irakurtzen du eta testu nagusia ateratzen du",
      "datuak egunero prozesatzen ditugu hodian",
      "motorrak emaitzak taulan idazten ditu",
      "iragazki on batek edukia gordetzen du eta zarata kentzen du",
      "hodiak testua ateratzen du dokumentu bakoitzetik",
      "emaitzak taulan idazten ditugu egunero"),
    "fao" -> Seq(
      "skipanin lesur hvørt skjal og tekur høvuðstekstin út",
      "vit viðgera dáturnar hvønn dag í leiðingini",
      "mótorurin skrivar úrslitini í talvuna",
      "gott filtur varðveitir innihaldið og tekur burtur larmin",
      "leiðingin tekur tekstin úr hvørjum skjali",
      "vit skriva úrslitini í talvuna hvønn dag"),
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
    "fry" -> Seq(
      "it systeem lêst elk dokumint en hellet de haadtekst derút",
      "wy ferwurkje de gegevens alle dagen yn de piipline",
      "de motor skriuwt de risseltaten yn de tabel",
      "in goed filter hâldt de ynhâld fêst en hellet it lûd fuort",
      "de piipline hellet de tekst út elk dokumint",
      "wy skriuwe de risseltaten yn de tabel"),
    "gla" -> Seq(
      "tha an siostam a' leughadh gach sgrìobhainn agus a' toirt a-mach am prìomh theacsa",
      "bidh sinn a' giullachd an dàta gach latha anns a' phìoblaidh",
      "tha an t-einnsean a' sgrìobhadh nan toraidhean dhan chlàr",
      "bidh sìoltachan math a' cumail na susbaint agus a' toirt air falbh am fuaim",
      "tha a' phìoblaidh a' toirt an teacsa a-mach à gach sgrìobhainn",
      "bidh sinn a' sgrìobhadh nan toraidhean dhan chlàr gach latha"),
    "gle" -> Seq(
      "léann an córas gach doiciméad agus baineann sé an príomhthéacs amach",
      "próiseálaimid na sonraí gach lá sa phíblíne",
      "scríobhann an t-inneall na torthaí sa tábla",
      "coinníonn scagaire maith an t-ábhar agus baineann sé an torann",
      "baineann an phíblíne an téacs as gach doiciméad",
      "scríobhaimid na torthaí sa tábla gach lá"),
    "glg" -> Seq(
      "o sistema le cada documento e saca o texto principal",
      "procesamos os datos cada xornada na canalización",
      "o motor escribe os resultados na táboa",
      "un bo filtro garda o contido e elimina o ruído",
      "a canalización saca o texto de cada documento",
      "escribimos os resultados na táboa cada xornada"),
    "guj" -> Seq(
      "સિસ્ટમ દરેક દસ્તાવેજ વાંચે છે અને મુખ્ય લખાણ કાઢે છે",
      "અમે દરરોજ પાઇપલાઇનમાં ડેટા પ્રક્રિયા કરીએ છીએ",
      "એન્જિન પરિણામો કોષ્ટકમાં લખે છે",
      "સારું ફિલ્ટર સામગ્રી રાખે છે અને ઘોંઘાટ દૂર કરે છે",
      "પાઇપલાઇન દરેક દસ્તાવેજમાંથી લખાણ કાઢે છે",
      "અમે પરિણામો કોષ્ટકમાં લખીએ છીએ"),
    "hat" -> Seq(
      "sistèm nan li chak dokiman epi li retire tèks prensipal la",
      "nou trete done yo chak jou nan kanal la",
      "motè a ekri rezilta yo nan tablo a",
      "yon bon filtè kenbe kontni an epi retire bri a",
      "kanal la retire tèks la nan chak dokiman",
      "nou ekri rezilta yo nan tablo a chak jou"),
    "hau" -> Seq(
      "tsarin yana karanta kowace takarda kuma yana fitar da babban rubutu",
      "muna sarrafa bayanai kowace rana a cikin bututun",
      "injin yana rubuta sakamako a cikin tebur",
      "matata mai kyau tana adana abun ciki kuma tana cire hayaniya",
      "bututun yana fitar da rubutu daga kowace takarda",
      "muna rubuta sakamako a cikin tebur kowace rana"),
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
    "hrv" -> Seq(
      "sustav čita svaki dokument i izvlači glavni tekst",
      "podatke obrađujemo svaki dan u cjevovodu",
      "motor zapisuje rezultate u tablicu",
      "dobar filtar čuva sadržaj i uklanja buku",
      "cjevovod izvlači tekst iz svakog dokumenta",
      "rezultate zapisujemo u tablicu svaki dan"),
    "hun" -> Seq(
      "a rendszer minden dokumentumot elolvas és kinyeri a fő szöveget",
      "minden nap feldolgozzuk az adatokat a csővezetékben",
      "a motor az eredményeket a táblába írja",
      "egy jó szűrő megtartja a tartalmat és eltávolítja a zajt",
      "a csővezeték kinyeri a szöveget minden dokumentumból",
      "az eredményeket minden nap a táblába írjuk"),
    "hye" -> Seq(
      "համակարգը կարդում է յուրաքանչյուր փաստաթուղթ և հանում է հիմնական տեքստը",
      "մենք ամեն օր մշակում ենք տվյալները խողովակաշարում",
      "շարժիչը գրում է արդյունքները աղյուսակում",
      "լավ զտիչը պահում է բովանդակությունը և հեռացնում է աղմուկը",
      "խողովակաշարը հանում է տեքստը յուրաքանչյուր փաստաթղթից",
      "մենք գրում ենք արդյունքները աղյուսակում"),
    "ibo" -> Seq(
      "usoro na agụ akwụkwọ ọ bụla ma wepụta isi ederede",
      "anyị na edozi data kwa ụbọchị na paịpụ",
      "igwe na ede nsonaazụ n'ime tebụl",
      "nzacha dị mma na echekwa ọdịnaya ma wepụ mkpọtụ",
      "paịpụ na ewepụta ederede site na akwụkwọ ọ bụla",
      "anyị na ede nsonaazụ n'ime tebụl kwa ụbọchị"),
    "ind" -> Seq(
      "sistem membaca setiap dokumen dan mengekstrak teks utama",
      "kami memproses data setiap hari dalam saluran pipa",
      "mesin menulis hasil ke dalam tabel",
      "filter yang baik menyimpan konten dan menghapus derau",
      "saluran pipa mengekstrak teks dari setiap dokumen",
      "kami menulis hasil ke dalam tabel setiap hari"),
    "isl" -> Seq(
      "kerfið les hvert skjal og dregur út meginmálið",
      "við vinnum gögnin á hverjum degi í leiðslunni",
      "vélin skrifar niðurstöðurnar í töfluna",
      "góð sía heldur innihaldinu og fjarlægir suðið",
      "leiðslan dregur textann út úr hverju skjali",
      "við skrifum niðurstöðurnar í töfluna á hverjum degi"),
    "ita" -> Seq(
      "il sistema legge ogni documento ed estrae il testo principale",
      "elaboriamo i dati ogni giorno nella pipeline",
      "il motore scrive i risultati nella tabella",
      "un buon filtro mantiene il contenuto ed elimina il rumore",
      "la pipeline estrae il testo da ogni documento",
      "scriviamo i risultati nella tabella ogni giorno"),
    "jav" -> Seq(
      "sistem maca saben dokumen lan njupuk teks utama",
      "kita ngolah data saben dina ing pipa",
      "mesin nulis asil menyang tabel",
      "saringan apik nyimpen isi lan mbusak gangguan",
      "pipa njupuk teks saka saben dokumen",
      "kita nulis asil menyang tabel saben dina"),
    "jpn" -> Seq(
      "システムはすべての文書を読み取り主要なテキストを抽出する",
      "私たちは毎日パイプラインでデータを処理する",
      "エンジンは結果をテーブルに書き込む",
      "良いフィルタは内容を保持し雑音を取り除く",
      "パイプラインはすべての文書からテキストを抽出する",
      "私たちは結果をテーブルに書き込む"),
    "kan" -> Seq(
      "ವ್ಯವಸ್ಥೆ ಪ್ರತಿ ದಾಖಲೆಯನ್ನು ಓದುತ್ತದೆ ಮತ್ತು ಮುಖ್ಯ ಪಠ್ಯವನ್ನು ಹೊರತೆಗೆಯುತ್ತದೆ",
      "ನಾವು ಪ್ರತಿದಿನ ಕೊಳವೆಯಲ್ಲಿ ದತ್ತಾಂಶವನ್ನು ಸಂಸ್ಕರಿಸುತ್ತೇವೆ",
      "ಯಂತ್ರವು ಫಲಿತಾಂಶಗಳನ್ನು ಕೋಷ್ಟಕದಲ್ಲಿ ಬರೆಯುತ್ತದೆ",
      "ಒಳ್ಳೆಯ ಸೋಸುಗವು ವಿಷಯವನ್ನು ಇಡುತ್ತದೆ ಮತ್ತು ಗದ್ದಲವನ್ನು ತೆಗೆಯುತ್ತದೆ",
      "ಕೊಳವೆಯು ಪ್ರತಿ ದಾಖಲೆಯಿಂದ ಪಠ್ಯವನ್ನು ಹೊರತೆಗೆಯುತ್ತದೆ",
      "ನಾವು ಫಲಿತಾಂಶಗಳನ್ನು ಕೋಷ್ಟಕದಲ್ಲಿ ಬರೆಯುತ್ತೇವೆ"),
    "kat" -> Seq(
      "სისტემა კითხულობს ყველა დოკუმენტს და იღებს მთავარ ტექსტს",
      "ჩვენ ყოველდღე ვამუშავებთ მონაცემებს მილსადენში",
      "ძრავა წერს შედეგებს ცხრილში",
      "კარგი ფილტრი ინახავს შინაარსს და აშორებს ხმაურს",
      "მილსადენი იღებს ტექსტს ყველა დოკუმენტიდან",
      "ჩვენ ვწერთ შედეგებს ცხრილში"),
    "kaz" -> Seq(
      "жүйе әрбір құжатты оқиды және негізгі мәтінді шығарады",
      "біз деректерді күн сайын құбырда өңдейміз",
      "қозғалтқыш нәтижелерді кестеге жазады",
      "жақсы сүзгі мазмұнды сақтайды және шуды жояды",
      "құбыр әрбір құжаттан мәтінді шығарады",
      "біз нәтижелерді кестеге жазамыз"),
    "khm" -> Seq(
      "ប្រព័ន្ធអានឯកសារនីមួយៗ ហើយទាញយកអត្ថបទសំខាន់",
      "យើងដំណើរការទិន្នន័យជារៀងរាល់ថ្ងៃនៅក្នុងបំពង់",
      "ម៉ាស៊ីនសរសេរលទ្ធផលទៅក្នុងតារាង",
      "តម្រងល្អរក្សាមាតិកា ហើយដកសំឡេងរំខានចេញ",
      "បំពង់ទាញយកអត្ថបទពីឯកសារនីមួយៗ",
      "យើងសរសេរលទ្ធផលទៅក្នុងតារាង"),
    "kir" -> Seq(
      "система ар бир документти окуйт жана негизги текстти чыгарат",
      "биз маалыматтарды күн сайын түтүктө иштетебиз",
      "кыймылдаткыч жыйынтыктарды таблицага жазат",
      "жакшы чыпка мазмунду сактайт жана ызы чууну жок кылат",
      "түтүк ар бир документтен текстти чыгарат",
      "биз жыйынтыктарды таблицага жазабыз"),
    "kor" -> Seq(
      "시스템은 모든 문서를 읽고 주요 텍스트를 추출한다",
      "우리는 매일 파이프라인에서 데이터를 처리한다",
      "엔진은 결과를 테이블에 기록한다",
      "좋은 필터는 내용을 유지하고 소음을 제거한다",
      "파이프라인은 모든 문서에서 텍스트를 추출한다",
      "우리는 결과를 테이블에 기록한다"),
    "lao" -> Seq(
      "ລະບົບອ່ານທຸກເອກະສານ ແລະ ດຶງເອົາຂໍ້ຄວາມຫຼັກ",
      "ພວກເຮົາປະມວນຜົນຂໍ້ມູນທຸກວັນໃນທໍ່ສົ່ງ",
      "ເຄື່ອງຈັກຂຽນຜົນໄດ້ຮັບລົງໃນຕາຕະລາງ",
      "ຕົວກອງທີ່ດີຮັກສາເນື້ອຫາ ແລະ ລຶບສຽງລົບກວນ",
      "ທໍ່ສົ່ງດຶງເອົາຂໍ້ຄວາມຈາກທຸກເອກະສານ",
      "ພວກເຮົາຂຽນຜົນໄດ້ຮັບລົງໃນຕາຕະລາງ"),
    "lat" -> Seq(
      "systema omne documentum legit et textum principalem extrahit",
      "data cotidie in ductu tractamus",
      "machina eventus in tabulam scribit",
      "colum bonum materiam servat et strepitum removet",
      "ductus textum ex omni documento extrahit",
      "eventus in tabulam cotidie scribimus"),
    "lav" -> Seq(
      "sistēma lasa katru dokumentu un izvelk galveno tekstu",
      "mēs apstrādājam datus katru dienu cauruļvadā",
      "dzinējs ieraksta rezultātus tabulā",
      "labs filtrs saglabā saturu un noņem troksni",
      "cauruļvads izvelk tekstu no katra dokumenta",
      "mēs ierakstām rezultātus tabulā katru dienu"),
    "lit" -> Seq(
      "sistema skaito kiekvieną dokumentą ir ištraukia pagrindinį tekstą",
      "mes kasdien apdorojame duomenis vamzdyne",
      "variklis įrašo rezultatus į lentelę",
      "geras filtras išsaugo turinį ir pašalina triukšmą",
      "vamzdynas ištraukia tekstą iš kiekvieno dokumento",
      "mes įrašome rezultatus į lentelę kasdien"),
    "ltz" -> Seq(
      "de system liest all dokument an hëlt den haapttext eraus",
      "mir veraarbechten d'donnéeë all dag an der pipeline",
      "de motor schreift d'resultater an d'tabell",
      "e gudde filter hält den inhalt a läscht de kaméidi",
      "d'pipeline hëlt den text aus all dokument eraus",
      "mir schreiwen d'resultater an d'tabell all dag"),
    "mal" -> Seq(
      "സിസ്റ്റം എല്ലാ രേഖകളും വായിക്കുകയും പ്രധാന വാചകം പുറത്തെടുക്കുകയും ചെയ്യുന്നു",
      "ഞങ്ങൾ എല്ലാ ദിവസവും കുഴലിൽ ഡാറ്റ സംസ്കരിക്കുന്നു",
      "യന്ത്രം ഫലങ്ങൾ പട്ടികയിൽ എഴുതുന്നു",
      "നല്ല അരിപ്പ ഉള്ളടക്കം സൂക്ഷിക്കുകയും ശബ്ദം നീക്കുകയും ചെയ്യുന്നു",
      "കുഴൽ എല്ലാ രേഖകളിൽ നിന്നും വാചകം പുറത്തെടുക്കുന്നു",
      "ഞങ്ങൾ ഫലങ്ങൾ പട്ടികയിൽ എഴുതുന്നു"),
    "mar" -> Seq(
      "प्रणाली प्रत्येक दस्तऐवज वाचते आणि मुख्य मजकूर काढते",
      "आम्ही दररोज पाइपलाइनमध्ये डेटावर प्रक्रिया करतो",
      "इंजिन निकाल तक्त्यात लिहिते",
      "चांगली गाळणी आशय ठेवते आणि गोंगाट काढून टाकते",
      "पाइपलाइन प्रत्येक दस्तऐवजातून मजकूर काढते",
      "आम्ही निकाल तक्त्यात लिहितो"),
    "mkd" -> Seq(
      "системот чита секој документ и го вади главниот текст",
      "ние ги обработуваме податоците секој ден во цевководот",
      "моторот ги запишува резултатите во табелата",
      "добар филтер ја чува содржината и ја отстранува бучавата",
      "цевководот го вади текстот од секој документ",
      "ние ги запишуваме резултатите во табелата"),
    "mlt" -> Seq(
      "is-sistema taqra kull dokument u tislet it-test ewlieni",
      "aħna nipproċessaw id-data kuljum fil-pajp",
      "il-magna tikteb ir-riżultati fit-tabella",
      "filtru tajjeb iżomm il-kontenut u jneħħi l-ħsejjes",
      "il-pajp jislet it-test minn kull dokument",
      "aħna niktbu ir-riżultati fit-tabella kuljum"),
    "mon" -> Seq(
      "систем баримт бүрийг уншиж үндсэн текстийг гаргаж авдаг",
      "бид өдөр бүр дамжуулах хоолойд өгөгдлийг боловсруулдаг",
      "хөдөлгүүр үр дүнг хүснэгтэд бичдэг",
      "сайн шүүлтүүр агуулгыг хадгалж шуугианыг арилгадаг",
      "дамжуулах хоолой баримт бүрээс текстийг гаргаж авдаг",
      "бид үр дүнг хүснэгтэд бичдэг"),
    "mri" -> Seq(
      "ka pānui te pūnaha i ia tuhinga ka tango i te kupu matua",
      "ka tukatuka mātou i ngā raraunga ia rā i roto i te paipa",
      "ka tuhi te mīhini i ngā hua ki te ripanga",
      "ka pupuri te tātari pai i te ihirangi ka tango i te haruru",
      "ka tango te paipa i te kupu mai i ia tuhinga",
      "ka tuhi mātou i ngā hua ki te ripanga ia rā"),
    "msa" -> Seq(
      "sistem membaca setiap dokumen dan mengeluarkan teks utama",
      "kami memproses data setiap hari dalam saluran paip",
      "enjin menulis keputusan ke dalam jadual",
      "penapis yang baik menyimpan kandungan dan membuang bunyi bising",
      "saluran paip mengeluarkan teks daripada setiap dokumen",
      "kami menulis keputusan ke dalam jadual setiap hari"),
    "mya" -> Seq(
      "စနစ်သည် စာရွက်စာတမ်းတိုင်းကို ဖတ်ပြီး အဓိက စာသားကို ထုတ်ယူသည်",
      "ကျွန်ုပ်တို့သည် နေ့တိုင်း ပိုက်လိုင်းတွင် ဒေတာကို လုပ်ဆောင်သည်",
      "အင်ဂျင်သည် ရလဒ်များကို ဇယားတွင် ရေးသည်",
      "ကောင်းသော စစ်ထုတ်ကိရိယာသည် အကြောင်းအရာကို ထိန်းသိမ်းပြီး ဆူညံသံကို ဖယ်ရှားသည်",
      "ပိုက်လိုင်းသည် စာရွက်စာတမ်းတိုင်းမှ စာသားကို ထုတ်ယူသည်",
      "ကျွန်ုပ်တို့သည် ရလဒ်များကို ဇယားတွင် ရေးကြသည်"),
    "nep" -> Seq(
      "प्रणालीले हरेक कागजात पढ्छ र मुख्य पाठ निकाल्छ",
      "हामी हरेक दिन पाइपलाइनमा डाटा प्रशोधन गर्छौं",
      "इन्जिनले नतिजाहरू तालिकामा लेख्छ",
      "राम्रो फिल्टरले सामग्री राख्छ र हल्ला हटाउँछ",
      "पाइपलाइनले हरेक कागजातबाट पाठ निकाल्छ",
      "हामी नतिजाहरू तालिकामा लेख्छौं"),
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
    "oci" -> Seq(
      "lo sistèma legís cada document e ne tira lo tèxte principal",
      "tractam las donadas cada jorn dins la canalizacion",
      "lo motor escriu los resultats dins la taula",
      "un bon filtre garda lo contengut e lèva lo bruch",
      "la canalizacion tira lo tèxte de cada document",
      "escrivèm los resultats dins la taula cada jorn"),
    "ori" -> Seq(
      "ସିଷ୍ଟମ ପ୍ରତ୍ୟେକ ଦଲିଲ ପଢ଼େ ଏବଂ ମୁଖ୍ୟ ପାଠ୍ୟ ବାହାର କରେ",
      "ଆମେ ପ୍ରତିଦିନ ପାଇପଲାଇନରେ ତଥ୍ୟ ପ୍ରକ୍ରିୟା କରୁ",
      "ଇଞ୍ଜିନ ଫଳାଫଳ ସାରଣୀରେ ଲେଖେ",
      "ଭଲ ଫିଲ୍ଟର ବିଷୟବସ୍ତୁ ରଖେ ଏବଂ କୋଳାହଳ ହଟାଏ",
      "ପାଇପଲାଇନ ପ୍ରତ୍ୟେକ ଦଲିଲରୁ ପାଠ୍ୟ ବାହାର କରେ",
      "ଆମେ ଫଳାଫଳ ସାରଣୀରେ ଲେଖୁ"),
    "pan" -> Seq(
      "ਸਿਸਟਮ ਹਰ ਦਸਤਾਵੇਜ਼ ਪੜ੍ਹਦਾ ਹੈ ਅਤੇ ਮੁੱਖ ਲਿਖਤ ਕੱਢਦਾ ਹੈ",
      "ਅਸੀਂ ਹਰ ਰੋਜ਼ ਪਾਈਪਲਾਈਨ ਵਿੱਚ ਡਾਟਾ ਪ੍ਰਕਿਰਿਆ ਕਰਦੇ ਹਾਂ",
      "ਇੰਜਣ ਨਤੀਜੇ ਸਾਰਣੀ ਵਿੱਚ ਲਿਖਦਾ ਹੈ",
      "ਚੰਗਾ ਫਿਲਟਰ ਸਮੱਗਰੀ ਰੱਖਦਾ ਹੈ ਅਤੇ ਰੌਲਾ ਹਟਾਉਂਦਾ ਹੈ",
      "ਪਾਈਪਲਾਈਨ ਹਰ ਦਸਤਾਵੇਜ਼ ਤੋਂ ਲਿਖਤ ਕੱਢਦੀ ਹੈ",
      "ਅਸੀਂ ਨਤੀਜੇ ਸਾਰਣੀ ਵਿੱਚ ਲਿਖਦੇ ਹਾਂ"),
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
    "pus" -> Seq(
      "سیسټم هره سند لولي او اصلي متن راباسي",
      "موږ هره ورځ په پایپ لاین کې معلومات پروسس کوو",
      "انجن پایلې په جدول کې لیکي",
      "ښه فلټر منځپانګه ساتي او شور لرې کوي",
      "پایپ لاین له هرې سند څخه متن راباسي",
      "موږ پایلې هره ورځ په جدول کې لیکو"),
    "que" -> Seq(
      "sistemaqa sapa documentota ñawinchan hinaspa hatun qillqata hurqun",
      "sapa punchaw willakuykunata pipelinepi llamkachiniku",
      "makinaqa ruwasqakunata tablaman qillqan",
      "allin suysunaqa contenidota waqaychan hinaspa chaqwata wikchun",
      "pipelineqa sapa documentomanta qillqata hurqun",
      "ruwasqakunata tablaman qillqaniku sapa punchaw"),
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
    "sin" -> Seq(
      "පද්ධතිය සෑම ලේඛනයක්ම කියවයි සහ මුල් පාඨය ගනී",
      "අපි සෑම දිනකම නළය තුළ දත්ත සකසමු",
      "එන්ජිම ලකුණු වගුවේ ලියයි",
      "හොඳ පෙරහනක් අන්තර්ගතය තබා ගනී සහ ශබ්දය ඉවත් කරයි",
      "නළය සෑම ලේඛනයකින්ම පාඨය ගනී",
      "අපි ලකුණු වගුවේ ලියමු"),
    "slk" -> Seq(
      "systém číta každý dokument a vyťahuje hlavný text",
      "spracovávame údaje každý deň v potrubí",
      "motor zapisuje výsledky do tabuľky",
      "dobrý filter zachováva obsah a odstraňuje šum",
      "potrubie vyťahuje hlavný text a spracovávame údaje z každého dokumentu",
      "čítame a zapisujeme výsledky do tabuľky každý deň"),
    "slv" -> Seq(
      "sistem prebere vsak dokument in izvleče glavno besedilo",
      "podatke obdelujemo vsak dan v cevovodu",
      "motor zapiše rezultate v tabelo",
      "dober filter ohrani vsebino in odstrani hrup",
      "cevovod izvleče besedilo iz vsakega dokumenta",
      "rezultate zapišemo v tabelo vsak dan"),
    "snd" -> Seq(
      "سسٽم هر دستاويز پڙهي ٿو ۽ مکيه متن ڪڍي ٿو",
      "اسين هر روز پائپ لائين ۾ ڊيٽا پروسيس ڪريون ٿا",
      "انجڻ نتيجا جدول ۾ لکي ٿو",
      "سٺو فلٽر مواد رکي ٿو ۽ گوڙ ختم ڪري ٿو",
      "پائپ لائين هر دستاويز مان متن ڪڍي ٿي",
      "اسين نتيجا جدول ۾ لکون ٿا"),
    "spa" -> Seq(
      "el sistema lee cada documento y extrae el texto principal",
      "procesamos los datos cada día en la tubería",
      "el motor escribe los resultados en la tabla",
      "un buen filtro guarda el contenido y elimina el ruido",
      "la tubería extrae el texto de cada documento",
      "escribimos los resultados en la tabla cada día"),
    "sqi" -> Seq(
      "sistemi lexon çdo dokument dhe nxjerr tekstin kryesor",
      "ne i përpunojmë të dhënat çdo ditë në tubacion",
      "motori i shkruan rezultatet në tabelë",
      "një filtër i mirë e ruan përmbajtjen dhe e heq zhurmën",
      "tubacioni e nxjerr tekstin nga çdo dokument",
      "ne i shkruajmë rezultatet në tabelë çdo ditë"),
    "srp" -> Seq(
      "систем чита сваки документ и извлачи главни текст",
      "податке обрађујемо сваког дана у цевоводу",
      "мотор записује резултате у табелу",
      "добар филтер чува садржај и уклања буку",
      "цевовод извлачи текст из сваког документа",
      "резултате записујемо у табелу сваког дана"),
    "sun" -> Seq(
      "sistem maca unggal dokumén jeung nyokot téks utama",
      "urang ngokolakeun data unggal poé dina pipa",
      "mesin nulis hasil kana tabél",
      "saringan anu alus nyimpen eusi jeung miceun gandéng",
      "pipa nyokot téks tina unggal dokumén",
      "urang nulis hasil kana tabél unggal poé"),
    "swa" -> Seq(
      "mfumo unasoma kila hati na kutoa maandishi makuu",
      "tunachakata data kila siku katika bomba",
      "injini inaandika matokeo kwenye jedwali",
      "kichujio kizuri kinahifadhi maudhui na kuondoa kelele",
      "bomba hutoa maandishi kutoka kila hati",
      "tunaandika matokeo kwenye jedwali kila siku"),
    "swe" -> Seq(
      "systemet läser varje dokument och extraherar huvudtexten",
      "vi behandlar data varje dag i pipelinen",
      "motorn skriver resultaten till tabellen",
      "ett bra filter behåller innehållet och tar bort bruset",
      "pipelinen extraherar texten från varje dokument",
      "vi skriver resultaten till tabellen varje dag"),
    "tam" -> Seq(
      "அமைப்பு ஒவ்வொரு ஆவணத்தையும் படித்து முக்கிய உரையை எடுக்கிறது",
      "நாங்கள் தினமும் குழாயில் தரவை செயலாக்குகிறோம்",
      "இயந்திரம் முடிவுகளை அட்டவணையில் எழுதுகிறது",
      "நல்ல வடிகட்டி உள்ளடக்கத்தை வைத்து சத்தத்தை நீக்குகிறது",
      "குழாய் ஒவ்வொரு ஆவணத்திலிருந்தும் உரையை எடுக்கிறது",
      "நாங்கள் முடிவுகளை அட்டவணையில் எழுதுகிறோம்"),
    "tat" -> Seq(
      "система һәр документны укый һәм төп текстны чыгара",
      "без мәгълүматларны көн саен торбада эшкәртәбез",
      "двигатель нәтиҗәләрне таблицага яза",
      "яхшы фильтр эчтәлекне саклый һәм шауны бетерә",
      "торба һәр документтан текстны чыгара",
      "без нәтиҗәләрне таблицага язабыз"),
    "tel" -> Seq(
      "వ్యవస్థ ప్రతి పత్రాన్ని చదివి ముఖ్య పాఠాన్ని తీస్తుంది",
      "మేము ప్రతిరోజూ గొట్టంలో డేటాను ప్రాసెస్ చేస్తాము",
      "యంత్రం ఫలితాలను పట్టికలో రాస్తుంది",
      "మంచి వడపోత విషయాన్ని ఉంచి శబ్దాన్ని తొలగిస్తుంది",
      "గొట్టం ప్రతి పత్రం నుండి పాఠాన్ని తీస్తుంది",
      "మేము ఫలితాలను పట్టికలో రాస్తాము"),
    "tgk" -> Seq(
      "система ҳар ҳуҷҷатро мехонад ва матни асосиро берун меорад",
      "мо ҳар рӯз маълумотро дар лӯла коркард мекунем",
      "муҳаррик натиҷаҳоро дар ҷадвал менависад",
      "филтри хуб мундариҷаро нигоҳ медорад ва ғавғоро дур мекунад",
      "лӯла матнро аз ҳар ҳуҷҷат берун меорад",
      "мо натиҷаҳоро дар ҷадвал менависем"),
    "tgl" -> Seq(
      "binabasa ng sistema ang bawat dokumento at kinukuha ang pangunahing teksto",
      "pinoproseso namin ang datos araw araw sa tubo",
      "isinusulat ng makina ang mga resulta sa talahanayan",
      "iniingatan ng mabuting salaan ang nilalaman at inaalis ang ingay",
      "kinukuha ng tubo ang teksto mula sa bawat dokumento",
      "isinusulat namin ang mga resulta sa talahanayan araw araw"),
    "tha" -> Seq(
      "ระบบอ่านเอกสารทุกฉบับและดึงข้อความหลักออกมา",
      "เราประมวลผลข้อมูลทุกวันในท่อส่ง",
      "เครื่องยนต์เขียนผลลัพธ์ลงในตาราง",
      "ตัวกรองที่ดีเก็บเนื้อหาและลบเสียงรบกวน",
      "ท่อส่งดึงข้อความจากเอกสารทุกฉบับ",
      "เราเขียนผลลัพธ์ลงในตาราง"),
    "tir" -> Seq(
      "እቲ ስርዓት ነፍሲ ወከፍ ሰነድ የንብብ እሞ ቀንዲ ጽሑፍ የውጽእ",
      "ንሕና መዓልታዊ ኣብቲ መስመር ዳታ ንሰርሕ",
      "እቲ ሞተር ንውጽኢታት ኣብቲ ሰሌዳ ይጽሕፍ",
      "ጽቡቕ መጻረዪ ንትሕዝቶ ይሕሉ እሞ ንጫውጫው የወግድ",
      "እቲ መስመር ካብ ነፍሲ ወከፍ ሰነድ ጽሑፍ የውጽእ",
      "ንሕና ንውጽኢታት ኣብቲ ሰሌዳ ንጽሕፍ"),
    "tur" -> Seq(
      "sistem her belgeyi okur ve ana metni çıkarır",
      "verileri her gün boru hattında işleriz",
      "motor sonuçları tabloya yazar",
      "iyi bir filtre içeriği korur ve gürültüyü kaldırır",
      "boru hattı her belgeden metni çıkarır",
      "sonuçları her gün tabloya yazarız"),
    "uig" -> Seq(
      "سىستېما ھەر بىر ھۆججەتنى ئوقۇيدۇ ۋە ئاساسلىق تېكىستنى چىقىرىدۇ",
      "بىز ھەر كۈنى تۇرۇبىدا سانلىق مەلۇماتلارنى بىر تەرەپ قىلىمىز",
      "ماتور نەتىجىلەرنى جەدۋەلگە يازىدۇ",
      "ياخشى سۈزگۈچ مەزمۇننى ساقلايدۇ ۋە شاۋقۇننى يوقىتىدۇ",
      "تۇرۇبا ھەر بىر ھۆججەتتىن تېكىستنى چىقىرىدۇ",
      "بىز نەتىجىلەرنى جەدۋەلگە يازىمىز"),
    "ukr" -> Seq(
      "система читає кожен документ і витягує основний текст",
      "ми обробляємо дані щодня в конвеєрі",
      "двигун записує результати в таблицю",
      "хороший фільтр зберігає вміст і прибирає шум",
      "конвеєр витягує текст з кожного документа",
      "ми записуємо результати в таблицю щодня"),
    "urd" -> Seq(
      "نظام ہر دستاویز پڑھتا ہے اور مرکزی متن نکالتا ہے",
      "ہم ہر روز پائپ لائن میں ڈیٹا پر کام کرتے ہیں",
      "انجن نتائج جدول میں لکھتا ہے",
      "اچھا فلٹر مواد رکھتا ہے اور شور ہٹاتا ہے",
      "پائپ لائن ہر دستاویز سے متن نکالتی ہے",
      "ہم نتائج جدول میں لکھتے ہیں"),
    "uzb" -> Seq(
      "tizim har bir hujjatni o'qiydi va asosiy matnni ajratib oladi",
      "biz ma'lumotlarni har kuni quvurda qayta ishlaymiz",
      "dvigatel natijalarni jadvalga yozadi",
      "yaxshi filtr mazmunni saqlaydi va shovqinni olib tashlaydi",
      "quvur har bir hujjatdan matnni ajratib oladi",
      "biz natijalarni jadvalga yozamiz"),
    "vie" -> Seq(
      "hệ thống đọc mọi tài liệu và trích xuất văn bản chính",
      "chúng tôi xử lý dữ liệu mỗi ngày trong đường ống",
      "động cơ ghi kết quả vào bảng",
      "bộ lọc tốt giữ nội dung và loại bỏ tiếng ồn",
      "đường ống trích xuất văn bản từ mọi tài liệu",
      "chúng tôi ghi kết quả vào bảng mỗi ngày"),
    "yid" -> Seq(
      "די סיסטעם לייענט יעדן דאקומענט און ציט ארויס דעם הויפט טעקסט",
      "מיר באארבעטן די דאטן יעדן טאג אין דער רער",
      "דער מאטאר שרייבט די רעזולטאטן אין דער טאבעלע",
      "א גוטער פילטער האלט דעם אינהאלט און נעמט אוועק דעם ליארעם",
      "די רער ציט ארויס דעם טעקסט פון יעדן דאקומענט",
      "מיר שרייבן די רעזולטאטן אין דער טאבעלע"),
    "yor" -> Seq(
      "eto naa n ka iwe kookan o si n yo oro pataki jade",
      "a n ṣe ilana data lojoojumo ninu opo gigun",
      "ero naa n ko awon esi sinu tabili",
      "ohun elo to dara n pa akoonu mo o si n yo ariwo kuro",
      "opo gigun n yo oro jade lati inu iwe kookan",
      "a n ko awon esi sinu tabili lojoojumo"),
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
    // first language. Resolved LAZILY in-plan as a broadcast of the
    // ONE-row min-lang aggregate (a constant-key equi-join folds to the
    // same nested-loop broadcast under constant propagation, so the
    // cross join is written honestly) — classify stays pure plan
    // construction, no driver-side action re-running the profile
    // lineage per call, and the row multiplier is exactly 1
    val fb = profiles.agg(min(col("lang")).as("fb_lang"))
    val pred = gCount.crossJoin(broadcast(fb))
      .join(best, Seq("sid"), "left")
      .select(col("sid"),
        coalesce(col("match_lang"), col("fb_lang")).as("pred_lang"),
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
